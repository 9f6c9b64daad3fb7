"""Trainer registry + CLI.

Parity: ``ever/trainer/__init__.py:7-67`` — ``get_trainer(name)`` returns a
zero-arg callable building the trainer from parsed CLI args.  Trainer names
keep the reference spellings plus TPU-native aliases:

- ``'base'``   — single-device Trainer
- ``'th_ddp'`` / ``'spmd'`` — mesh data-parallel SPMDTrainer (DDP equivalent)
- ``'gan_th_ddp'`` / ``'gan_spmd'`` — GAN trainer (dict-of-optimizers)
"""

from __future__ import annotations

import argparse
import os

from ever_tpu.trainer.trainer import SPMDTrainer, Trainer

# Reference class spellings (``ever/trainer/__init__.py:4``): the SPMD mesh
# trainer is the DDP analog, the GAN variant resolves lazily below.
THDDPTrainer = SPMDTrainer

__all__ = ['get_trainer', 'parse_args', 'get_default_parser', 'TRAINER',
           'THDDPTrainer', 'THDDPGANTrainer']


def _gan_trainer(args):
    from ever_tpu.trainer.gan import GANSPMDTrainer
    return GANSPMDTrainer(args)


def THDDPGANTrainer(args):
    """Reference spelling of the GAN trainer (``trainer/__init__.py:4,8``)."""
    return _gan_trainer(args)


TRAINER = {
    'base': Trainer,
    'th_ddp': SPMDTrainer,     # reference spelling; SPMD is the DDP analog
    'spmd': SPMDTrainer,
    'gan_th_ddp': _gan_trainer,
    'gan_spmd': _gan_trainer,
}


def get_default_parser() -> argparse.ArgumentParser:
    """CLI surface parity: ``ever/trainer/__init__.py:14-43``."""
    parser = argparse.ArgumentParser(description='ever_tpu training launcher')
    parser.add_argument('--config_path', required=True, type=str,
                        help='config file path or dotted name under configs/')
    parser.add_argument('--model_dir', required=True, type=str)
    parser.add_argument('--trainer', default='th_ddp', type=str,
                        choices=sorted(TRAINER))
    parser.add_argument('--mixed_precision', default='fp32', type=str,
                        choices=['fp32', 'fp16', 'bf16'],
                        help="fp16 maps to bf16 on TPU (no GradScaler needed)")
    parser.add_argument('--use_wandb', action='store_true')
    parser.add_argument('--use_tensorboard', action='store_true')
    parser.add_argument('--project', default=None, type=str)
    parser.add_argument('--entity', default=None, type=str)
    parser.add_argument('--local_rank', default=0, type=int,
                        help='accepted for surface parity; unused under SPMD')
    parser.add_argument('--find_unused_parameters', action='store_true',
                        help='accepted for surface parity; meaningless in XLA')
    parser.add_argument('opts', nargs=argparse.REMAINDER,
                        help='free-form dotted-key overrides: k v [k v ...]')
    return parser


def parse_args(argv=None) -> argparse.Namespace:
    args = get_default_parser().parse_args(argv)
    if args.mixed_precision == 'fp16':
        args.mixed_precision = 'bf16'
    return args


def get_trainer(name: str = None, argv=None):
    """Return a zero-arg trainer factory (parity: ``trainer/__init__.py:46-67``)."""
    args = parse_args(argv)
    key = name or args.trainer
    if key not in TRAINER:
        raise KeyError(f'unknown trainer {key!r}; available: {sorted(TRAINER)}')
    return lambda: TRAINER[key](args)
