"""Path-parity shim: ``ever.magic.transform.tta`` (reference ``ever/magic/transform/tta.py:11-42``)."""

from ever_tpu.magic._transform_impl import TestTimeAugmentation, d4_tta, tta

__all__ = ['tta', 'TestTimeAugmentation', 'd4_tta']
