"""Default-config + user-config merge semantics.

Parity with the reference ``ConfigurableMixin`` (``ever/interface/configurable.py:5-37``):
a configurable object owns an :class:`~ever_tpu.core.config.AttrDict` ``config``
populated by ``set_default_config()`` and then recursively updated with the
user-supplied config, so user configs only need to specify deltas.

(The reference additionally mixes in HuggingFace's ``PyTorchModelHubMixin``;
the equivalent workflow — ``save_pretrained``/``from_pretrained`` with a
``config.json`` + weights archive, plus a network-gated ``push_to_hub`` —
lives on :class:`ERModule`.)
"""

from __future__ import annotations

from typing import Optional

from ever_tpu.core.config import AttrDict


class ConfigurableMixin:
    """Holds a merged ``config`` AttrDict: class defaults ⊕ user overrides."""

    def __init__(self, config: Optional[dict] = None):
        self._config = AttrDict()
        self.set_default_config()
        if config:
            self._config.update(config)

    @property
    def config(self) -> AttrDict:
        return self._config

    def set_default_config(self) -> None:
        """Subclasses populate ``self.config`` with defaults here."""


def merge_config(defaults: dict, user: Optional[dict]) -> AttrDict:
    """Functional form of the default ⊕ user merge (for dataclass-style modules)."""
    cfg = AttrDict(defaults or {})
    if user:
        cfg.update(user)
    return cfg


__all__ = ['ConfigurableMixin', 'merge_config']
