"""Path-parity shim: ``ever.trainer.th_ddp_trainer`` (reference
``ever/trainer/th_ddp_trainer.py:10-90``).

``THDDPTrainer`` maps to the mesh/SPMD trainer (DDP's data-parallel semantics
are expressed as a sharded batch + compiler-inserted gradient ``psum``);
``THDDPGANTrainer``/``GANLauncher`` carry the dict-of-optimizers GAN path.
"""

from ever_tpu.trainer import THDDPGANTrainer, THDDPTrainer
from ever_tpu.trainer.gan import GANLauncher

__all__ = ['THDDPTrainer', 'THDDPGANTrainer', 'GANLauncher']
