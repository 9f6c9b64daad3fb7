"""Path-parity package: ``ever.magic.bigimage`` (reference ``ever/magic/bigimage/``)."""

from ever_tpu.magic.sliding_window import sliding_window

__all__ = ['sliding_window']
