"""Double-buffered host→HBM prefetch.

Replaces the reference's ``pin_memory``/``non_blocking`` CUDA copy path
(``ever/interface/dataloader.py:44-52``, ``ever/core/launcher.py:314``):
while the device computes step N, the next host batch is already being
transferred — ``jax.device_put`` is async, so simply staying one batch ahead
overlaps H2D with compute (SURVEY.md §7 step 4).
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import jax

__all__ = ['prefetch_to_device']


def prefetch_to_device(iterator: Iterator, size: int = 2,
                       sharding: Optional[Any] = None) -> Iterator:
    """Wrap a host-batch iterator with an N-deep device-transfer queue."""
    queue = []

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        # host_to_global handles the multi-process case, where each host's
        # batch is a LOCAL slice of the global array (a bare device_put would
        # misread it as the full global value)
        from ever_tpu.parallel.mesh import host_to_global
        return host_to_global(batch, sharding)

    def enqueue(n):
        for _ in range(n):
            try:
                batch = next(iterator)
            except StopIteration:
                return
            queue.append(put(batch))

    enqueue(size)
    while queue:
        yield queue.pop(0)
        enqueue(1)
