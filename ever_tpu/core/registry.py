"""Component registries.

Parity with the reference registry (``ever/core/registry.py:46-130``): a
``Registry`` is a dict from name to callable, populated by decorator or direct
call, with duplicate warnings and directory/file auto-import helpers so user
projects can drop modules into ``module/``, ``data/`` or ``callback/`` dirs and
have them registered on import.  Eight global registries mirror the reference:
``LR, OPT, DATALOADER, MODEL, LOSS, OP, CALLBACK, DATASET``.
"""

from __future__ import annotations

import glob
import hashlib
import importlib.util
import logging
import os
import sys
from typing import Callable, Optional, TypeVar

logger = logging.getLogger('ever_tpu.registry')

_T = TypeVar('_T')


def _is_main_process() -> bool:
    # Late import to keep registry usable without jax initialised.
    try:
        from ever_tpu.core import dist
        return dist.is_main_process()
    except Exception:
        return True


class Registry(dict):
    """Name → callable registry with decorator registration.

    Usage::

        MODEL = Registry('model')

        @MODEL.register()
        class FarSeg(...): ...

        @MODEL.register('custom_name')
        def build(...): ...

        MODEL.register_fn(some_callable)
    """

    def __init__(self, name: str = ''):
        super().__init__()
        self._name = name

    @property
    def name(self) -> str:
        return self._name

    def _do_register(self, key: str, obj: Callable) -> None:
        if key in self and _is_main_process():
            logger.warning('%r is already registered in registry %r; overwriting', key, self._name)
        self[key] = obj

    def register(self, name_or_obj=None, obj: Optional[Callable] = None, verbose: bool = True):
        """Register a component.  Three call styles (parity with the reference):

        - ``@R.register()`` / ``@R.register`` — decorator, name from ``__name__``;
        - ``@R.register('name')`` — decorator with explicit name;
        - ``R.register('name', obj)`` — direct call.
        """
        del verbose  # accepted for surface parity; warnings are logger-managed
        if callable(name_or_obj) and obj is None:
            self._do_register(name_or_obj.__name__, name_or_obj)
            return name_or_obj
        if obj is not None:
            self._do_register(name_or_obj, obj)
            return obj

        explicit = name_or_obj

        def deco(o: _T) -> _T:
            self._do_register(explicit or o.__name__, o)  # type: ignore[union-attr]
            return o

        return deco

    # alias matching the decorator-less call style in the reference
    register_fn = register

    def __repr__(self) -> str:
        return f'Registry(name={self._name!r}, items={sorted(self.keys())})'


_REGISTERED_FILES: dict = {}


def register_file(py_file: str) -> None:
    """Import a single ``.py`` file so its registration decorators run.

    Parity: ``ever/core/registry.py:88-104``.
    """
    py_file = os.path.abspath(py_file)
    # guard on the FULL path, not the basename: module/farseg.py and
    # callback/farseg.py are different files whose registrations must both
    # run.  A path hash (not the path mapped into dots) keys the module name
    # so dots in directory names can't alias two distinct files either.
    if py_file in _REGISTERED_FILES:
        return
    base = os.path.splitext(os.path.basename(py_file))[0].replace('-', '_')
    digest = hashlib.sha1(py_file.encode('utf-8')).hexdigest()[:10]
    mod_name = f'ever_tpu._user.{base}_{digest}'
    spec = importlib.util.spec_from_file_location(mod_name, py_file)
    module = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = module
    # mark registered only AFTER the import succeeds — a failed import must
    # be retryable (and must not leave a half-initialized module importable)
    try:
        spec.loader.exec_module(module)  # type: ignore[union-attr]
    except BaseException:
        sys.modules.pop(mod_name, None)
        raise
    _REGISTERED_FILES[py_file] = mod_name


def register_dir(dir_path: str, recursive: bool = False) -> None:
    """Import every ``.py`` file in a directory (parity: ``registry.py:106-120``)."""
    pattern = os.path.join(dir_path, '**', '*.py') if recursive else os.path.join(dir_path, '*.py')
    for py_file in sorted(glob.glob(pattern, recursive=recursive)):
        if os.path.basename(py_file).startswith('_'):
            continue
        register_file(py_file)


# The eight global registries (parity: ``ever/core/registry.py:123-130``).
LR = Registry('learning_rate')
OPT = Registry('optimizer')
DATALOADER = Registry('dataloader')
MODEL = Registry('model')
LOSS = Registry('loss')
OP = Registry('op')
CALLBACK = Registry('callback')
DATASET = Registry('dataset')

__all__ = [
    'Registry', 'register_file', 'register_dir',
    'LR', 'OPT', 'DATALOADER', 'MODEL', 'LOSS', 'OP', 'CALLBACK', 'DATASET',
]


def register_modules() -> None:
    """Auto-import a user project's ``module/`` dir (parity:
    ``ever/core/registry.py:109-110``)."""
    register_dir('module')


def register_dataloaders() -> None:
    """Auto-import a user project's ``data/`` dir (parity:
    ``ever/core/registry.py:113-114``)."""
    register_dir('data')


def register_callbacks() -> None:
    register_dir('callback')


def register_all() -> None:
    """Register a user project's module/data/callback dirs (parity:
    ``ever/core/registry.py:117-120``)."""
    import os
    for d in ('data', 'module', 'callback'):
        if os.path.isdir(d):
            register_dir(d)
