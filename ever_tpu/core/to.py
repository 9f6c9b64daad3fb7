"""Pytree host↔device transfer helpers.

Parity: ``ever/core/to.py:5-56`` (recursive ``to_tensor``/``to_device`` over
dict/list/tuple/namedtuple).  In JAX a single ``jax.device_put`` already maps
over pytrees; these wrappers add numpy conversion and optional sharding.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def _is_leaf_array(x) -> bool:
    return isinstance(x, (np.ndarray, np.generic, int, float, bool)) or hasattr(x, '__array__')


def to_tensor(data: Any) -> Any:
    """Recursively convert array-likes to numpy (host staging form)."""
    return jax.tree.map(lambda x: np.asarray(x) if _is_leaf_array(x) else x, data)


def to_device(data: Any, sharding: Optional[Any] = None) -> Any:
    """Move a pytree of arrays into device memory (optionally sharded)."""
    if sharding is None:
        return jax.device_put(data)
    return jax.device_put(data, sharding)


__all__ = ['to_tensor', 'to_device']


def auto_device():
    """The default JAX device (parity: ``ever/core/device.py:7-8``)."""
    import jax
    return jax.devices()[0]


def cpu_device():
    """Parity: ``ever/core/device.py:11-12``."""
    import jax
    return jax.devices('cpu')[0]


def tpu_device(id=None):
    """Parity: ``ever/core/device.py:15-19`` (``gpu_device`` → TPU here).

    Tunneled TPU plugins report platform names like 'axon' with a 'TPU ...'
    device_kind (same fallback as ``ops/attention.py``), so fall back to a
    device_kind scan when ``jax.devices('tpu')`` knows no such backend.
    """
    import jax
    try:
        devs = jax.devices('tpu')
    except RuntimeError:
        devs = [d for d in jax.devices()
                if d.platform == 'tpu' or 'tpu' in d.device_kind.lower()]
        if not devs:
            raise
    return devs[id or 0]


# reference spelling: the accelerator handle
gpu_device = tpu_device

__all__ += ['auto_device', 'cpu_device', 'gpu_device', 'tpu_device']
