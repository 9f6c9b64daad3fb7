"""Path-parity shim: ``ever.magic.bigimage.sliding_window`` (reference
``ever/magic/bigimage/sliding_window.py:8-33``)."""

from ever_tpu.magic.sliding_window import sliding_window

__all__ = ['sliding_window']
