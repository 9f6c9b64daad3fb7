"""Multi-host / multi-device helpers (TPU-native replacement of NCCL wrappers).

The reference wraps ``torch.distributed`` (``ever/core/dist.py``): NCCL process
groups, gloo object collectives, main-process checks.  On TPU the equivalents
are structurally different and mostly *disappear into the compiler*:

- DDP gradient all-reduce → data-parallel sharding under ``jit`` (XLA inserts
  the ``psum`` over ICI automatically);
- ``reduce_loss_dict`` (``dist.py:118-140``) → ``jax.lax.pmean`` inside the
  jitted step (free; fused);
- gloo object ``all_gather`` of confusion matrices (``dist.py:63-115``) →
  on-device dense CM + ``psum`` (see ``ever_tpu/metric``);
- ``is_main_process`` (``dist.py:8-31``) → ``jax.process_index() == 0``;
- ``synchronize`` barrier (``dist.py:143-160``) → multihost sync utils.

What remains host-side is thin and lives here.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional


def _jax():
    import jax
    return jax


def get_world_size() -> int:
    """Number of participating host processes (1 when not distributed)."""
    try:
        return _jax().process_count()
    except Exception:
        return int(os.environ.get('EVER_TPU_PROCESS_COUNT', '1'))


def get_rank() -> int:
    """Index of this host process."""
    try:
        return _jax().process_index()
    except Exception:
        return int(os.environ.get('EVER_TPU_PROCESS_INDEX', '0'))


def get_local_device_count() -> int:
    return _jax().local_device_count()


def get_global_device_count() -> int:
    return _jax().device_count()


def is_main_process() -> bool:
    return get_rank() == 0


def main_process_only(fn: Callable) -> Callable:
    """Decorator: run only on process 0 (parity: ``ever/core/dist.py:42-48``)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return fn(*args, **kwargs)
        return None

    return wrapper


def init_dist_env(coordinator_address: Optional[str] = None,
                  num_processes: Optional[int] = None,
                  process_id: Optional[int] = None) -> None:
    """Initialise JAX multi-process runtime (replacement for NCCL env init,
    ``ever/core/dist.py:34-39``).  A no-op on single-process runs and when
    already initialised."""
    jax = _jax()
    # NOTE: do not touch jax.process_count()/jax.devices() before
    # distributed.initialize — any backend query initialises the LOCAL
    # runtime and the later initialize() becomes a no-op (verified by
    # tools/multiprocess_validation.py).
    if getattr(jax.distributed, 'is_initialized', lambda: False)():
        return  # already initialised by the runtime
    if coordinator_address is None and 'JAX_COORDINATOR_ADDRESS' not in os.environ \
            and num_processes is None:
        return  # single-process run; nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def synchronize() -> None:
    """Cross-host barrier (parity: ``ever/core/dist.py:143-160``)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices('ever_tpu.synchronize')


def broadcast_one_to_all(pytree):
    """Broadcast host-side values from process 0 to all processes."""
    if get_world_size() == 1:
        return pytree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(pytree)


def all_gather_host(value):
    """Gather arbitrary (pytree-of-array) host values across processes.

    Replaces the gloo pickled-object ``all_gather`` (``ever/core/dist.py:63-115``).
    Returns a list of per-process values on every process.
    """
    if get_world_size() == 1:
        return [value]
    from jax.experimental import multihost_utils
    stacked = multihost_utils.process_allgather(value)
    import jax
    n = get_world_size()
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n)]


def all_gather(value):
    """Reference spelling of :func:`all_gather_host`
    (``ever/core/dist.py:95-115``)."""
    return all_gather_host(value)


def gather(value, dst: int = 0):
    """Gather host values to process ``dst`` (parity: ``ever/core/dist.py:63-92``).

    Implemented over :func:`all_gather_host` — JAX multihost collectives are
    symmetric, so every process pays the same traffic; non-dst processes get
    ``[]`` to mirror the reference contract.
    """
    if get_world_size() == 1:
        return [value]
    gathered = all_gather_host(value)
    return gathered if get_rank() == dst else []


def reduce_loss_dict(loss_dict: dict) -> dict:
    """Average a host-side loss dict across processes onto rank 0 (parity:
    ``ever/core/dist.py:118-140``).

    Inside the jitted SPMD train step losses are already globally averaged by
    the compiler-inserted collectives; this host-level helper exists for
    hand-rolled loops that keep per-process python floats.
    """
    world = get_world_size()
    if world < 2:
        return loss_dict
    keys = sorted(loss_dict)
    gathered = all_gather_host([float(loss_dict[k]) for k in keys])
    if get_rank() != 0:
        return loss_dict
    import numpy as _np
    mean = _np.mean(_np.asarray(gathered), axis=0)
    return {k: float(v) for k, v in zip(keys, mean)}


__all__ = [
    'gather', 'all_gather', 'reduce_loss_dict',
    'get_world_size', 'get_rank', 'get_local_device_count', 'get_global_device_count',
    'is_main_process', 'main_process_only', 'init_dist_env', 'synchronize',
    'broadcast_one_to_all', 'all_gather_host',
]
