"""Python-file config system.

Behavioral parity with the reference config system (reference:
``ever/core/config.py:25-122``): configs are plain Python files that define a
``config`` dict; ``import_config`` executes the file and wraps the dict in an
:class:`AttrDict` (an ordered dict with attribute access, recursive merge
semantics and CLI dotted-key overrides).  A ``.pkl`` round-trip is supported so
a training run can persist its exact config for later inference-time rebuild.
"""

from __future__ import annotations

import ast
import copy as _copy
import importlib.util
import os
import pickle
from collections import OrderedDict
from typing import Any, Iterable, List, Sequence


class AttrDict(OrderedDict):
    """Ordered dict with attribute access and recursive update.

    Semantics (parity with reference ``ever/core/config.py:57-122``):

    - ``d.key`` reads/writes ``d['key']``.
    - Nested plain dicts are promoted to ``AttrDict`` on construction and on
      assignment; lists/tuples of dicts are promoted element-wise.
    - :meth:`update` merges recursively: if both old and new values are dicts
      the old one is updated in place rather than replaced.
    - :meth:`update_from_list` applies CLI-style dotted-key overrides
      (``['train.lr', '0.1']``) with ``ast.literal_eval`` typing.
    """

    def __init__(self, *args, **kwargs):
        super().__init__()
        if args:
            if len(args) != 1:
                raise TypeError(f'AttrDict expected at most 1 positional argument, got {len(args)}')
            self._init_from(args[0])
        self._init_from(kwargs)

    def _init_from(self, mapping) -> None:
        if hasattr(mapping, 'items'):
            items: Iterable = mapping.items()
        else:
            items = mapping
        for k, v in items:
            self[k] = _promote(v)

    # -- attribute access ---------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name.startswith('__') and name.endswith('__'):
            raise AttributeError(name)
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if name.startswith('_OrderedDict__'):
            super().__setattr__(name, value)
        else:
            self[name] = _promote(value)

    def __setitem__(self, key, value) -> None:
        super().__setitem__(key, _promote(value))

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    # -- recursive merge ----------------------------------------------------
    def update(self, other=None, **kwargs):  # type: ignore[override]
        if other is not None:
            _recursive_update(self, other)
        if kwargs:
            _recursive_update(self, kwargs)
        return self

    def update_from_list(self, opts: Sequence[str]):
        """Apply flat ``[key, value, key, value, ...]`` dotted-path overrides.

        Values go through ``ast.literal_eval`` when possible so ``'0.1'``
        becomes a float and ``'[1, 2]'`` a list (parity:
        ``ever/core/config.py:91-109``).
        """
        if opts is None:
            return self
        if len(opts) % 2 != 0:
            raise ValueError(f'override list must have even length, got {len(opts)}: {opts}')
        for dotted, raw in zip(opts[0::2], opts[1::2]):
            low = raw.lower() if isinstance(raw, str) else raw
            if low in ('true', 'false'):
                # 'false' is not a Python literal: literal_eval would leave
                # the TRUTHY string 'false' in the config — a silent no-op
                # for every boolean flag typed in lowercase
                value = (low == 'true')
            elif low == 'null':
                # JSON spelling for None. Deliberately NOT 'none': that is a
                # common literal string enum value (e.g. loss reduction)
                # that must survive as a string ('None' parses via
                # literal_eval for the Python spelling).
                value = None
            else:
                try:
                    value = ast.literal_eval(raw)
                except (ValueError, SyntaxError):
                    value = raw
            node = self
            keys = dotted.split('.')
            for k in keys[:-1]:
                if k not in node or not isinstance(node[k], dict):
                    node[k] = AttrDict()
                node = node[k]
            node[keys[-1]] = value
        return self

    # -- conversion ---------------------------------------------------------
    def to_dict(self) -> dict:
        """Deep-convert back to plain nested dicts/lists."""
        return _demote(self)

    def copy(self) -> 'AttrDict':  # type: ignore[override]
        return _copy.deepcopy(self)

    def __deepcopy__(self, memo) -> 'AttrDict':
        new = AttrDict()
        memo[id(self)] = new
        for k, v in self.items():
            OrderedDict.__setitem__(new, _copy.deepcopy(k, memo), _copy.deepcopy(v, memo))
        return new

    def __reduce__(self):
        return (_attrdict_from_plain, (self.to_dict(),))


def _attrdict_from_plain(d: dict) -> 'AttrDict':
    return AttrDict(d)


def _promote(value: Any) -> Any:
    if isinstance(value, AttrDict):
        return value
    if isinstance(value, dict):
        return AttrDict(value)
    if isinstance(value, (list, tuple)):
        promoted = [
            _promote(v) if isinstance(v, (dict, list, tuple)) else v for v in value
        ]
        return type(value)(promoted) if isinstance(value, tuple) else promoted
    return value


def _demote(value: Any) -> Any:
    if isinstance(value, dict):
        return {k: _demote(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        out = [_demote(v) for v in value]
        return tuple(out) if isinstance(value, tuple) else out
    return value


def _recursive_update(dst: dict, src) -> None:
    if hasattr(src, 'items'):
        items: Iterable = src.items()
    else:
        items = src
    for k, v in items:
        if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
            _recursive_update(dst[k], v)
        else:
            dst[k] = _promote(v)


class FrozenConfig:
    """Read-only view over an :class:`AttrDict` that survives flax field freezing.

    flax.linen converts plain-dict module fields into ``FrozenDict`` (losing
    attribute access), but leaves non-dict objects alone.  ``ERModule`` wraps
    its merged config in this class so ``self.config.key`` works inside
    ``setup``/``__call__``.  Nested values are AttrDicts and keep attribute
    access naturally.
    """

    __slots__ = ('_d',)

    def __init__(self, d: dict):
        object.__setattr__(self, '_d', d if isinstance(d, AttrDict) else AttrDict(d))

    def __getattr__(self, name: str) -> Any:
        try:
            return self._d[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        raise AttributeError('FrozenConfig is read-only')

    def __getitem__(self, key):
        return self._d[key]

    def __contains__(self, key) -> bool:
        return key in self._d

    def __iter__(self):
        return iter(self._d)

    def __len__(self) -> int:
        return len(self._d)

    def get(self, key, default=None):
        return self._d.get(key, default)

    def keys(self):
        return self._d.keys()

    def items(self):
        return self._d.items()

    def values(self):
        return self._d.values()

    def to_dict(self) -> dict:
        return self._d.to_dict()

    def unfrozen(self) -> AttrDict:
        return _copy.deepcopy(self._d)

    def __eq__(self, other) -> bool:
        if isinstance(other, FrozenConfig):
            return self._d == other._d
        return NotImplemented

    def __hash__(self):
        return hash(repr(self._d))

    def __repr__(self) -> str:
        return f'FrozenConfig({dict(self._d)!r})'


def from_dict(d: dict) -> AttrDict:
    return AttrDict(d)


def import_config(config_path: str, prefix: str = 'configs') -> AttrDict:
    """Load a config from a ``.py`` file path, dotted module name, or ``.pkl``.

    Accepted forms (parity: ``ever/core/config.py:25-54``):

    - ``/abs/path/to/cfg.py`` or ``rel/path/cfg.py`` — executed as a module;
      its ``config`` dict is wrapped in an :class:`AttrDict`.
    - ``cfgname`` or ``sub.cfgname`` — resolved to ``{prefix}/sub/cfgname.py``
      under the current working directory.
    - ``/abs/path/to/cfg.pkl`` — unpickled (a config previously saved by a
      training run).
    """
    if config_path.endswith('.pkl'):
        with open(config_path, 'rb') as f:
            cfg = pickle.load(f)
        return cfg if isinstance(cfg, AttrDict) else AttrDict(cfg)

    if config_path.endswith('.py') or os.sep in config_path or os.path.isfile(config_path):
        path = config_path
    else:
        path = os.path.join(prefix, *config_path.split('.')) + '.py'
    if not os.path.isfile(path):
        raise FileNotFoundError(f'config file not found: {path!r} (from {config_path!r})')

    spec = importlib.util.spec_from_file_location('_ever_tpu_config', path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)  # type: ignore[union-attr]
    if not hasattr(module, 'config'):
        raise AttributeError(f'config file {path!r} does not define a `config` dict')
    return AttrDict(module.config)


def save_pkl(config: AttrDict, path: str) -> None:
    """Persist a config for exact inference-time rebuild (``config.pkl``)."""
    with open(path, 'wb') as f:
        pickle.dump(config if isinstance(config, AttrDict) else AttrDict(config), f)


__all__ = ['AttrDict', 'FrozenConfig', 'from_dict', 'import_config', 'save_pkl']


def from_pickle(path: str) -> AttrDict:
    """Load a pickled config (parity: ``ever/core/config.py`` ``from_pickle``;
    the trainer persists ``config.pkl`` into every ``model_dir``)."""
    with open(path, 'rb') as f:
        cfg = pickle.load(f)
    return cfg if isinstance(cfg, AttrDict) else from_dict(cfg)


__all__ += ['from_pickle']


def to_dict(obj):
    """Recursively demote AttrDicts to plain containers (parity:
    ``ever/core/config.py:43-49``)."""
    if isinstance(obj, FrozenConfig):
        return obj.to_dict()
    if isinstance(obj, dict):
        return {k: to_dict(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [to_dict(v) for v in obj]
    return obj
