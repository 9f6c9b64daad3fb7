"""Checkpoint save/resume with a JSON index.

Parity: ``ever/core/checkpoint.py:21-180`` — a checkpoint is the triple
``{model, opt, global_step}``; files are ``checkpoint-{step}.ckpt`` under the
model dir; ``checkpoint_info.json`` maps step → file and tracks ``last`` so
resume-after-crash is discoverable; ``try_resume`` restores model + optimizer
state + global step.  Serialization is flax msgpack (``flax.serialization``)
of host-fetched pytrees — multi-host safe because state is replicated and only
process 0 writes.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
from flax import serialization

from ever_tpu.core.dist import is_main_process

__all__ = ['CheckPoint', 'is_checkpoint', 'load_model_state_from_ckpt',
           'remove_optimizer_in_ckpt']

MODEL = 'model'
OPTIMIZER = 'opt'
GLOBALSTEP = 'global_step'
LASTCHECKPOINT = 'last'
CHECKPOINT_NAME = 'checkpoint_info.json'


def is_checkpoint(obj) -> bool:
    """Duck-check for a checkpoint dict (parity: ``checkpoint.py:9-18``)."""
    return isinstance(obj, dict) and all(k in obj for k in (MODEL, OPTIMIZER, GLOBALSTEP))


def _to_host(tree):
    return jax.tree.map(lambda x: jax.device_get(x), tree)


class CheckPoint:
    MODEL = MODEL
    OPTIMIZER = OPTIMIZER
    GLOBALSTEP = GLOBALSTEP
    LASTCHECKPOINT = LASTCHECKPOINT
    CHECKPOINT_NAME = CHECKPOINT_NAME

    def __init__(self, launcher=None, backend: str = 'msgpack'):
        """``backend``: 'msgpack' (single-file, default), 'orbax'
        (directory-per-checkpoint; for sharded/multi-host state at scale),
        or 'orbax_async' (same format; the device→disk write overlaps
        training — the step resumes as soon as arrays are snapshotted to
        host, the serialize/flush runs on a background thread.  The next
        ``save`` and :meth:`wait` barrier on the in-flight write; an atexit
        hook guarantees the last one completes)."""
        if backend not in ('msgpack', 'orbax', 'orbax_async'):
            raise ValueError(f'unknown checkpoint backend: {backend!r}')
        self.backend = backend
        self._launcher = launcher
        self._global_step = 0
        self._async_ckptr = None
        self._pending: Optional[dict] = None
        self._json_log: Dict[str, Any] = {LASTCHECKPOINT: dict(step=0, name='')}
        self.init_checkpoint_info_from_launcher()

    # -- global step ---------------------------------------------------------
    def set_global_step(self, value: int) -> None:
        if value < 0:
            raise ValueError('The global step must be larger than zero.')
        self._global_step = int(value)

    @property
    def global_step(self) -> int:
        return self._global_step

    def step(self) -> None:
        self._global_step += 1

    # -- wiring --------------------------------------------------------------
    def set_launcher(self, launcher) -> None:
        self._launcher = launcher
        self.init_checkpoint_info_from_launcher()

    def init_checkpoint_info_from_launcher(self) -> None:
        if self._launcher is None:
            return
        info = self.load_checkpoint_info(self._launcher.model_dir)
        if info is not None:
            self._json_log = info

    # -- save ----------------------------------------------------------------
    def save(self, filename: Optional[str] = None) -> None:
        state = self._launcher.state
        if filename is None:
            filename = self.get_checkpoint_name(self.global_step,
                                                backend=self.backend)
        filepath = os.path.join(self._launcher.model_dir, filename)
        if self.backend.startswith('orbax'):
            # orbax saves are multi-host collectives — EVERY process must
            # reach this call (SaveCheckpointCallback reports only_master
            # False for orbax backends so run_callbacks doesn't gate it)
            self._save_orbax(filepath, state)
        elif is_main_process():
            # build the host copy only where it is written: a whole-state
            # device_get on non-main hosts would be discarded (and on the
            # tunneled backend serialize running compute)
            ckpt = {
                MODEL: dict(params=_to_host(state.params),
                            batch_stats=_to_host(state.batch_stats)),
                OPTIMIZER: _to_host(state.opt_state),
                GLOBALSTEP: self.global_step,
            }
            with open(filepath, 'wb') as f:
                f.write(serialization.to_bytes(ckpt))
        if self.backend == 'orbax_async':
            # do NOT record the step as resumable until the background write
            # finalizes — a crash mid-write would otherwise leave the JSON
            # index pointing at a missing/uncommitted directory.  The record
            # commits at the next save's barrier, at wait(), or atexit.
            self._pending = dict(step=self.global_step, name=filename)
        else:
            self._record_saved(self.global_step, filename)
        if self._launcher.logger is not None:
            self._launcher.logger.save_log(filename)

    def _record_saved(self, step: int, filename: str) -> None:
        self._json_log[str(step)] = filename
        if step >= self._json_log[LASTCHECKPOINT]['step']:
            self._json_log[LASTCHECKPOINT] = dict(step=step, name=filename)
        self.save_checkpoint_info(self._launcher.model_dir)

    def _commit_pending(self) -> None:
        pending = getattr(self, '_pending', None)
        if pending is not None:
            self._pending = None
            self._record_saved(pending['step'], pending['name'])

    def save_checkpoint_info(self, model_dir: str) -> None:
        if not is_main_process():
            return
        with open(os.path.join(model_dir, CHECKPOINT_NAME), 'w') as f:
            json.dump(self._json_log, f)

    # -- orbax backend ---------------------------------------------------------
    def _save_orbax(self, dirpath: str, state) -> None:
        import orbax.checkpoint as ocp
        tree = {
            MODEL: dict(params=state.params, batch_stats=state.batch_stats),
            OPTIMIZER: state.opt_state,
            GLOBALSTEP: self.global_step,
        }
        if self.backend == 'orbax_async':
            if self._async_ckptr is None:
                import atexit
                self._async_ckptr = ocp.AsyncCheckpointer(
                    ocp.PyTreeCheckpointHandler())
                atexit.register(self.wait)
            self._async_ckptr.wait_until_finished()   # previous in-flight save
            self._commit_pending()                    # now provably on disk
            self._async_ckptr.save(os.path.abspath(dirpath), tree, force=True)
            return
        ocp.PyTreeCheckpointer().save(os.path.abspath(dirpath), tree, force=True)

    def wait(self) -> None:
        """Barrier on an in-flight async checkpoint write (no-op otherwise)."""
        if self._async_ckptr is not None:
            self._async_ckptr.wait_until_finished()
            self._commit_pending()

    # -- sharded save/restore (states too big for one chip) --------------------
    @staticmethod
    def save_sharded(dirpath: str, tree) -> None:
        """Orbax save of a pytree whose leaves may be SHARDED ``jax.Array``s
        (e.g. a ZeRO-3/TP TrainState from
        :func:`ever_tpu.parallel.sharded.create_train_state_sharded`).
        Each process writes only its addressable shards — the full tree is
        never gathered anywhere (multi-host safe; on one host it is simply
        a per-shard write)."""
        import orbax.checkpoint as ocp
        ocp.PyTreeCheckpointer().save(os.path.abspath(dirpath), tree,
                                      force=True)

    @staticmethod
    def restore_sharded(dirpath: str, abstract_tree, shardings):
        """Restore a checkpoint DIRECTLY into a sharded layout.

        ``abstract_tree`` is a pytree of ``jax.ShapeDtypeStruct`` (e.g. from
        :func:`ever_tpu.parallel.sharded.abstract_train_state`) and
        ``shardings`` the matching ``NamedSharding`` tree.  Orbax reads each
        leaf straight into its shards — no leaf is ever materialized
        replicated, which is what makes restoring a 7B-scale state onto
        16 GB chips possible at all (the reference loads full state dicts
        host-side, ``ever/core/checkpoint.py:84-117``)."""
        import orbax.checkpoint as ocp
        target = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            abstract_tree, shardings)
        restore_args = ocp.checkpoint_utils.construct_restore_args(target)
        return ocp.PyTreeCheckpointer().restore(
            os.path.abspath(dirpath), item=target, restore_args=restore_args)

    @staticmethod
    def _load_orbax(dirpath: str, template: Optional[dict] = None) -> dict:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        if template is not None:
            return ckptr.restore(os.path.abspath(dirpath), item=template)
        return ckptr.restore(os.path.abspath(dirpath))

    # -- load ----------------------------------------------------------------
    @staticmethod
    def load(filepath: str, template: Optional[dict] = None) -> dict:
        """Load a checkpoint file (msgpack) or directory (orbax).  With
        ``template`` (a matching pytree of arrays) the stored bytes are
        restored structurally; without, a raw nested-dict view is returned."""
        if os.path.isdir(filepath):
            return CheckPoint._load_orbax(filepath, template)
        with open(filepath, 'rb') as f:
            raw = f.read()
        if template is not None:
            return serialization.from_bytes(template, raw)
        return serialization.msgpack_restore(raw)

    def try_resume(self) -> bool:
        """json → path → load → restore state + global step
        (parity: ``checkpoint.py:84-117``).  Returns True if resumed."""
        if self._launcher is None:
            return False
        info = self.load_checkpoint_info(self._launcher.model_dir)
        if info is None or not info[LASTCHECKPOINT]['name']:
            return False
        last_path = os.path.join(self._launcher.model_dir, info[LASTCHECKPOINT]['name'])
        if not os.path.exists(last_path):
            return False
        state = self._launcher.state
        template = {
            MODEL: dict(params=_to_host(state.params),
                        batch_stats=_to_host(state.batch_stats)),
            OPTIMIZER: _to_host(state.opt_state),
            GLOBALSTEP: 0,
        }
        ckpt = self.load(last_path, template)
        self._launcher.restore_state(
            params=ckpt[MODEL]['params'],
            batch_stats=ckpt[MODEL]['batch_stats'],
            opt_state=ckpt[OPTIMIZER],
            global_step=int(ckpt[GLOBALSTEP]),
        )
        self.set_global_step(int(ckpt[GLOBALSTEP]))
        if self._launcher.logger is not None:
            self._launcher.logger.restore_log(last_path)
        return True

    @staticmethod
    def load_checkpoint_info(model_dir: str) -> Optional[dict]:
        json_path = os.path.join(model_dir, CHECKPOINT_NAME)
        if not os.path.exists(json_path):
            return None
        with open(json_path) as f:
            return json.load(f)

    @staticmethod
    def get_checkpoint_name(global_step: int, backend: str = 'msgpack') -> str:
        if backend.startswith('orbax'):
            return f'checkpoint-{global_step}'
        return f'checkpoint-{global_step}.ckpt'


def load_model_state_from_ckpt(filepath: str) -> dict:
    """Model-only view of a checkpoint file (parity: ``checkpoint.py:176-180``
    and ``load_model_state_dict_from_ckpt``)."""
    ckpt = CheckPoint.load(filepath)
    return ckpt[MODEL] if is_checkpoint(ckpt) else ckpt


def remove_optimizer_in_ckpt(fp: str, new_fp: Optional[str] = None) -> None:
    ckpt = CheckPoint.load(fp)
    ckpt.pop(OPTIMIZER, None)
    if os.path.isdir(fp):
        # orbax checkpoint directory: rewrite in the same format (opening a
        # directory for binary write would raise IsADirectoryError)
        import orbax.checkpoint as ocp
        ocp.PyTreeCheckpointer().save(os.path.abspath(new_fp or fp), ckpt,
                                      force=True)
        return
    with open(new_fp or fp, 'wb') as f:
        f.write(serialization.msgpack_serialize(ckpt))


def load_model_state_dict_from_ckpt(filepath: str) -> dict:
    """Reference spelling of :func:`load_model_state_from_ckpt`
    (``ever/core/checkpoint.py``)."""
    return load_model_state_from_ckpt(filepath)


def remove_module_prefix(state_dict: dict, prefix: str = 'module.') -> dict:
    """Strip a key prefix from a flat state dict (parity: the reference's DDP
    ``module.``-prefix cleanup in ``ever/core/checkpoint.py``)."""
    return {(k[len(prefix):] if k.startswith(prefix) else k): v
            for k, v in state_dict.items()}
