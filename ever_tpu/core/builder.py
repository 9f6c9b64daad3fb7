"""Config → object factories.

Parity with ``ever/core/builder.py:3-62``: every factory takes an AttrDict of
the form ``{type: <registry key>, params: {...}}`` and instantiates the
registered component.  Differences forced by JAX:

- ``make_model`` returns an (unbound) linen module — parameters are
  initialised later by the launcher/trainer via ``module.init`` (and then
  optionally overlaid from ``config.GLOBAL.weight.path``, parity with
  ``ever/interface/module.py:31-68`` → ``ever_tpu.util.weight_io``).
- ``make_optimizer`` returns an ``optax.GradientTransformation`` plus the
  original config (the reference attaches ``opt.er_config`` for later
  grad-clip lookup, ``builder.py:15-22``; we return it explicitly).
"""

from __future__ import annotations

import inspect
from typing import Any, Tuple

from ever_tpu.core import registry
from ever_tpu.core.config import AttrDict


def _check(cfg, what: str) -> AttrDict:
    if 'type' not in cfg:
        raise KeyError(f"{what} config needs a 'type' key, got keys {list(cfg.keys())}")
    return cfg.get('params', AttrDict())


def make_model(config) -> Any:
    """Build a model from ``{type, params}`` via the MODEL registry.

    ``ERModule`` subclasses receive the params dict as their single config
    argument; plain modules/callables receive ``**params``
    (parity: ``ever/core/builder.py:47-62``).
    """
    from ever_tpu.interface.module import ERModule

    params = _check(config, 'model')
    cls = registry.MODEL[config['type']]
    if inspect.isclass(cls) and issubclass(cls, ERModule):
        return cls(params)
    return cls(**params)


def make_dataloader(config) -> Any:
    """Build a dataloader from the DATALOADER or DATASET registry.

    Parity: ``ever/core/builder.py:34-44`` — a DATASET entry is instantiated
    and converted via its ``to_dataloader()`` method.
    """
    params = _check(config, 'dataloader')
    t = config['type']
    if t in registry.DATALOADER:
        return registry.DATALOADER[t](params)
    if t in registry.DATASET:
        return registry.DATASET[t](params).to_dataloader()
    raise KeyError(f'{t!r} is registered in neither DATALOADER nor DATASET')


def make_learningrate(config) -> Any:
    """Build an LR schedule from the LR registry (``builder.py:25-31``)."""
    params = _check(config, 'learning_rate')
    return registry.LR[config['type']](**params)


def make_optimizer(config) -> Tuple[Any, AttrDict]:
    """Build an optax optimizer; returns ``(tx, opt_config)``.

    ``opt_config`` carries ``grad_clip``/``params`` for the train-step builder
    (the reference stashes it on the torch optimizer as ``er_config``,
    ``builder.py:15-22``; grad-clip defaults live in
    ``ever/interface/module.py:96-108``).
    """
    params = _check(config, 'optimizer')
    tx = registry.OPT[config['type']](**params)
    return tx, AttrDict(config)


def make_callback(config) -> Any:
    params = _check(config, 'callback')
    return registry.CALLBACK[config['type']](**params)


__all__ = ['make_model', 'make_dataloader', 'make_learningrate', 'make_optimizer', 'make_callback']
