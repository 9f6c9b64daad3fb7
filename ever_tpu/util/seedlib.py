"""Seeding utilities.

Parity: ``ever/util/seedlib.py:9-39``.  JAX is deterministic-by-default given
fixed PRNG keys; these helpers cover the *host-side* randomness (numpy
samplers, python random, torch if present) and preserve the per-rank seed
offset (``seedlib.py:26-28``) as ``seed + process_index``.
"""

from __future__ import annotations

import random

import numpy as np

from ever_tpu.core.dist import get_rank

__all__ = ['seed_everything', 'seed_torch', 'worker_init_fn']


def seed_everything(seed: int = 2333, deterministic: bool = False,
                    device_specific: bool = False) -> int:
    """Seed host RNGs; returns the effective seed (rank-offset when
    ``device_specific``).  ``deterministic`` is accepted for surface parity —
    XLA is already deterministic for a fixed program + seed."""
    if device_specific:
        seed = seed + get_rank()
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch
        torch.manual_seed(seed)
    except ImportError:
        pass
    return seed


seed_torch = seed_everything  # reference-surface alias


def worker_init_fn(worker_id: int, num_workers: int, rank: int,
                   seed: int = 2333) -> None:
    """Per-worker seed = num_workers * rank + worker_id + seed
    (parity: ``seedlib.py:9-22``)."""
    worker_seed = num_workers * rank + worker_id + seed
    np.random.seed(worker_seed)
    random.seed(worker_seed)
