"""`ERModule` — the configurable model base class (flax.linen edition).

Parity target: reference ``ever/interface/module.py:12-108``.  The reference
couples four concerns into one ``nn.Module`` subclass: (1) default⊕user config
merge, (2) weight-file loading with prefix stripping/regex excepts, (3) the
training contract (forward returns a dict whose ``*loss`` keys are summed),
and (4) gradient application (clip + step).  In JAX these split naturally:

- (1) stays here: an ``ERModule`` is a linen module with a single ``config``
  field, merged from ``set_default_config()`` defaults and the user dict at
  construction time — so ``MODEL['Name'](params_dict)`` works exactly like the
  reference registry path (``ever/core/builder.py:47-62``).
- (2) operates on *param pytrees*, not modules → ``ever_tpu.util.weight_io``.
- (3) stays: ``__call__(x, y=None, train=False)`` returns a loss dict when
  training; :func:`sum_losses` implements the ``*loss``-key summation
  (parity: ``ever/interface/module.py:76-81``).
- (4) becomes pure optax transforms inside the jitted train step
  (clip-by-global-norm parity with ``module.py:96-108`` lives in
  ``ever_tpu/opt/optimizer.py``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ever_tpu.core.config import AttrDict, FrozenConfig

# Reserved top-level config key carrying run-global options (weight init path,
# etc.).  Parity: ``ever/interface/module.py:13,21-23``.
GLOBAL_KEY = 'GLOBAL'


class ERModule(nn.Module):
    """Configurable linen module.

    Subclasses override :meth:`set_default_config` to populate defaults and
    implement ``__call__``.  Construction accepts a single (possibly partial)
    config dict::

        @MODEL.register()
        class MySeg(ERModule):
            def set_default_config(self):
                self.config.update(dict(classes=7, channels=256))

            @nn.compact
            def __call__(self, x, y=None, train=False):
                ...

        m = MySeg(dict(classes=5))           # config.classes == 5, channels == 256

    The training contract mirrors the reference: when ``train=True`` and
    labels are given, ``__call__`` returns a dict; every key ending in
    ``'loss'`` is summed into the scalar objective, other keys are logged as
    metrics (parity: ``ever/interface/module.py:76-81`` and the launcher hot
    loop ``ever/core/launcher.py:194-222``).
    """

    config: Any = None

    def __post_init__(self):
        user = self.config
        if isinstance(user, FrozenConfig):  # e.g. module.clone()
            user = user.unfrozen()
        merged = AttrDict()
        object.__setattr__(self, 'config', merged)
        self.set_default_config()
        if user:
            merged.update(user)
        # Wrap so flax's field freezing (dict → FrozenDict) leaves attribute
        # access intact inside setup()/__call__.
        object.__setattr__(self, 'config', FrozenConfig(merged))
        super().__post_init__()

    # -- configuration ------------------------------------------------------
    def set_default_config(self) -> None:
        """Populate ``self.config`` with class defaults (override me)."""

    @property
    def global_config(self) -> AttrDict:
        """The reserved ``GLOBAL`` sub-config (weight path etc.)."""
        return self.config.get(GLOBAL_KEY, AttrDict())

    # -- hooks ---------------------------------------------------------------
    def custom_param_groups(self, params) -> Optional[Dict]:
        """Optional per-parameter optimizer groups.

        Return ``(labels, lr_mults)`` — ``labels`` a pytree of str group
        labels matching ``params``' structure (a prefix pytree also works,
        ``optax.multi_transform`` semantics) and ``lr_mults`` a
        ``{label: lr_multiplier}`` dict — or ``None`` for a single group.
        ``params`` is ``None`` when called at optimizer-build time (before
        init); prefix pytrees keyed by top-level module names handle that.
        Parity: ``ever/interface/module.py:73-74``; consumer:
        ``opt/optimizer.py`` ``OptimizerFactory.build(param_groups=...)``.
        """
        return None

    def log_info(self) -> Dict[str, Any]:
        """Extra static info to log at startup (parity: ``module.py:70-71``)."""
        return {}

    # -- pretrained save/load (the hub-mixin workflow) ------------------------
    # The reference's ConfigurableMixin extends HuggingFace's
    # PyTorchModelHubMixin so every ERModule is save/from_pretrained-able
    # (``ever/interface/configurable.py:2,5``).  Flax modules are stateless,
    # so the variables travel explicitly.
    @nn.nowrap
    def save_pretrained(self, save_directory: str, variables: Dict) -> None:
        """Write ``config.json`` + ``model.msgpack`` to a directory."""
        import json
        import os
        from flax import serialization
        from ever_tpu.core.registry import MODEL

        os.makedirs(save_directory, exist_ok=True)
        name = type(self).__name__
        if name not in MODEL:
            raise ValueError(f'{name} is not registered in MODEL — '
                             'save_pretrained needs a registry name to rebuild')
        cfg = self.config.unfrozen() if hasattr(self.config, 'unfrozen') \
            else dict(self.config)
        with open(os.path.join(save_directory, 'config.json'), 'w') as f:
            json.dump({'type': name, 'params': _jsonable(cfg)}, f, indent=2)
        with open(os.path.join(save_directory, 'model.msgpack'), 'wb') as f:
            f.write(serialization.to_bytes(variables))

    @nn.nowrap
    def push_to_hub(self, repo_id: str, variables: Optional[Dict] = None,
                    save_directory: Optional[str] = None, *,
                    private: bool = False, token: Optional[str] = None,
                    commit_message: Optional[str] = None,
                    create_repo: bool = True):
        """Publish :meth:`save_pretrained` output to a Hugging Face Hub repo.

        Parity: the reference's ``ConfigurableMixin`` extends
        ``PyTorchModelHubMixin`` (``ever/interface/configurable.py:2,5``),
        making every module ``push_to_hub``-able.  Serialization happens
        locally first (``config.json`` + ``model.msgpack`` — the exact
        :meth:`from_pretrained` layout), then the directory uploads via
        ``huggingface_hub.upload_folder``.  Network-gated: offline (or
        without ``huggingface_hub``) it raises with the manual recipe
        instead of hanging.

        Pass ``variables`` to serialize fresh, or ``save_directory`` to push
        an existing :meth:`save_pretrained` directory as-is.
        """
        import os
        import tempfile

        try:
            from huggingface_hub import HfApi
        except ImportError as e:
            raise RuntimeError(
                'push_to_hub needs the huggingface_hub package; offline '
                'recipe: save_pretrained(dir, variables) then upload the '
                'directory with `huggingface_hub.upload_folder` (or the web '
                'UI) once networked') from e

        if (variables is None) == (save_directory is None):
            raise ValueError('pass exactly one of variables= (serialize '
                             'fresh) or save_directory= (push as-is)')

        def _push(folder: str):
            api = HfApi(token=token)
            if create_repo:
                api.create_repo(repo_id, private=private, exist_ok=True)
            return api.upload_folder(
                repo_id=repo_id, folder_path=folder,
                commit_message=commit_message
                or f'upload {type(self).__name__} (ever_tpu)')

        if save_directory is not None:
            if not os.path.exists(os.path.join(save_directory, 'config.json')):
                raise ValueError(f'{save_directory!r} is not a '
                                 'save_pretrained directory (no config.json)')
            return _push(save_directory)
        with tempfile.TemporaryDirectory() as td:
            self.save_pretrained(td, variables)
            return _push(td)

    @classmethod
    def from_pretrained(cls, save_directory: str):
        """Rebuild ``(module, variables)`` from :meth:`save_pretrained` output."""
        import json
        import os
        from flax import serialization
        from ever_tpu.core import builder

        with open(os.path.join(save_directory, 'config.json')) as f:
            spec = json.load(f)
        module = builder.make_model(spec)
        with open(os.path.join(save_directory, 'model.msgpack'), 'rb') as f:
            variables = serialization.msgpack_restore(f.read())
        return module, variables


def _jsonable(obj):
    """Config → plain JSON types (tuples → lists, AttrDicts → dicts)."""
    if isinstance(obj, dict) or hasattr(obj, 'items'):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    return obj


def sum_losses(loss_dict: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Sum every ``*loss`` entry of a forward output dict into the objective.

    Parity: ``ever/interface/module.py:76-81`` (``backward`` summation).
    Non-loss keys are treated as metrics and ignored here.
    """
    total = 0.0
    for k, v in loss_dict.items():
        if k.endswith('loss'):
            total = total + jnp.asarray(v, jnp.float32)
    return jnp.asarray(total, jnp.float32)


def split_metrics(loss_dict: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """All entries (losses and metrics) as scalar fp32 for logging."""
    return {k: jnp.asarray(v, jnp.float32) for k, v in loss_dict.items()}


__all__ = ['ERModule', 'sum_losses', 'split_metrics', 'GLOBAL_KEY']
