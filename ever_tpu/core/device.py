"""Path-parity shim: ``ever.core.device`` (reference ``ever/core/device.py:7-19``).

On TPU, device placement is made by shardings rather than per-tensor
``.to(device)`` calls; these helpers return ``jax.Device`` objects for the
rare host-side placement (``gpu_device`` is the reference spelling for "the
accelerator" — a TPU here).
"""

from ever_tpu.core.to import auto_device, cpu_device, gpu_device, tpu_device

__all__ = ['auto_device', 'cpu_device', 'gpu_device', 'tpu_device']
