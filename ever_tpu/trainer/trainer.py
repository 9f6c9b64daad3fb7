"""Trainer — config-driven launch orchestration.

Parity target: ``ever/trainer/trainer.py:38-244`` (base ``Trainer``) and
``ever/trainer/th_ddp_trainer.py:10-40`` (``THDDPTrainer``).  On TPU there is
no per-GPU process + DDP-wrap step: ``SPMDTrainer`` builds ONE mesh over all
chips and the data-parallel semantics come from sharding inside the jitted
train step.  Everything else keeps the reference surface: import config +
apply CLI ``opts``, pickle the config into the model dir, build dataloaders /
model / lr+optimizer via the registries, wire ``custom_param_groups``, then
``launcher.train_by_config``.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from ever_tpu.core import builder, dist
from ever_tpu.core.config import AttrDict, import_config, save_pkl
from ever_tpu.core.launcher import Launcher
from ever_tpu.core.logger import Logger
from ever_tpu.parallel.mesh import make_mesh

__all__ = ['Trainer', 'SPMDTrainer', 'merge_dict', 'half_bn']


def merge_dict(a: dict, b: dict) -> dict:
    """Merge with duplicate-key error (parity: ``trainer/trainer.py:18-29``)."""
    out = dict(a)
    for k, v in b.items():
        if k in out:
            raise ValueError(f'duplicate key in merge_dict: {k!r}')
        out[k] = v
    return out


def half_bn(params_or_tree):
    """Surface parity with ``trainer/trainer.py:32-35`` (torch's per-module
    BN ``.half()``).  In this stack precision is a module config
    (``dtype='bfloat16'``) and norm statistics accumulate in fp32 inside
    the bf16-typed flax BatchNorm, so there is nothing to convert; provided
    as an explicit no-op so reference call sites port unchanged."""
    return params_or_tree


class Trainer:
    def __init__(self, args):
        self.args = args
        self._config = import_config(args.config_path)
        opts = getattr(args, 'opts', None)
        if opts:
            self._config.update_from_list(opts)
        self._model_dir = args.model_dir
        self.initialize_workspace()
        self._launcher: Optional[Launcher] = None
        self._model_fn: Optional[Callable] = None

    # -- workspace -----------------------------------------------------------
    def initialize_workspace(self) -> None:
        """mkdir + persist config.pkl for inference-time rebuild
        (parity: ``trainer/trainer.py:52-55``)."""
        if dist.is_main_process():
            os.makedirs(self._model_dir, exist_ok=True)
            save_pkl(self._config, os.path.join(self._model_dir, 'config.pkl'))

    @property
    def config(self) -> AttrDict:
        return self._config

    @property
    def model_dir(self) -> str:
        return self._model_dir

    @property
    def launcher(self) -> Optional[Launcher]:
        return self._launcher

    # -- factories -----------------------------------------------------------
    def make_model(self):
        """Build the model; honour ``--mixed_precision bf16`` by injecting a
        compute dtype into the model params (parity intent:
        ``core/launcher.py:40-50`` autocast selection)."""
        model_cfg = self._config.model
        mp = getattr(self.args, 'mixed_precision', 'fp32')
        if mp == 'bf16':
            params = model_cfg.setdefault('params', AttrDict())
            params.setdefault('dtype', 'bfloat16')
        model = builder.make_model(model_cfg)
        if self._model_fn is not None:
            model = self._model_fn(model)
        return model

    def model_fn(self, fn: Callable) -> None:
        """Hook to wrap/replace the built model (parity: ``trainer.py:66-70``)."""
        self._model_fn = fn

    def make_dataloader(self, data_cfg):
        return builder.make_dataloader(data_cfg)

    def make_lr_optimizer(self, model):
        """Build (schedule, optax tx) incl. grad-clip and custom param groups
        (parity: ``trainer/trainer.py:84-119``; dict-of-optimizer GAN configs
        are handled by the GAN trainer)."""
        lr_cfg = self._config.learning_rate
        opt_cfg = self._config.optimizer
        schedule = builder.make_learningrate(lr_cfg)
        factory, opt_config = builder.make_optimizer(opt_cfg)
        # reference parity: clip ONLY when the config has a grad_clip key
        # (ever/interface/module.py:96-108); absent -> unclipped training
        grad_clip = opt_config.get('grad_clip', None)
        param_groups = None
        if hasattr(model, 'custom_param_groups'):
            pg = model.custom_param_groups(None)
            if pg is not None:
                param_groups = pg
        frozen = None
        # freeze_at / frozen_stages: the model's frozen_param_prefixes hook
        # is authoritative (parity: ``resnet.py:162-173``)
        fn = getattr(model, 'frozen_param_prefixes', None)
        if callable(fn):
            got = tuple(fn())
            if got:
                frozen = got
        if frozen is None and hasattr(model, 'config'):
            # fallback for models without the hook: a RESNET encoder config
            # under 'encoder' is the one shape we can probe generically
            enc_cfg = model.config.get('encoder', None)
            if enc_cfg and int(enc_cfg.get('freeze_at', 0) or 0) >= 1:
                if enc_cfg.get('resnet_type'):
                    from ever_tpu.module.resnet import ResNetEncoder
                    probe = ResNetEncoder(dict(enc_cfg))
                    frozen = tuple('encoder/' + p
                                   for p in probe.frozen_param_prefixes())
                else:
                    import logging
                    logging.getLogger('ever_tpu').warning(
                        'encoder.freeze_at=%s set but the model exposes no '
                        'frozen_param_prefixes hook and the encoder is not '
                        'a resnet config — nothing will be frozen',
                        enc_cfg.get('freeze_at'))
        tx = factory.build(schedule, grad_clip=grad_clip,
                           param_groups=param_groups, frozen_prefixes=frozen)
        return schedule, tx

    # -- launcher wiring ------------------------------------------------------
    def make_mesh(self):
        return None  # base trainer: single-device semantics

    def build_launcher(self) -> Launcher:
        model = self.make_model()
        schedule, tx = self.make_lr_optimizer(model)
        logger = Logger(
            'ever_tpu', tensorboard_logdir=self._model_dir,
            use_tensorboard=getattr(self.args, 'use_tensorboard', False),
            use_wandb=getattr(self.args, 'use_wandb', False),
            wandb_config=dict(project=getattr(self.args, 'project', None),
                              entity=getattr(self.args, 'entity', None),
                              config=self._config.to_dict())
            if getattr(self.args, 'use_wandb', False) else None)
        self._launcher = Launcher(
            model_dir=self._model_dir,
            model=model,
            optimizer=tx,
            lr_schedule=schedule,
            mixed_precision=getattr(self.args, 'mixed_precision', 'fp32'),
            mesh=self.make_mesh(),
            logger=logger,
            seed=int(self._config.get('seed', 42)),
            checkpoint_backend=self._config.get('checkpoint_backend', 'msgpack'),
        )
        return self._launcher

    # -- entries --------------------------------------------------------------
    def run(self, after_construct_launcher_callbacks=None):
        """Full training entry (parity: ``trainer/trainer.py:163-233``)."""
        train_dl = self.make_dataloader(self._config.data.train)
        test_dl = None
        if 'test' in self._config.get('data', {}):
            test_dl = self.make_dataloader(self._config.data.test)
        return self.train_with_dataloader(train_dl, test_dl,
                                          after_construct_launcher_callbacks)

    def train_with_dataloader(self, train_dl, test_dl=None,
                              after_construct_launcher_callbacks=None):
        tl = self.build_launcher()
        tl.info(f'config: {self.args.config_path}; model_dir: {self._model_dir}')
        tl.info(f'devices: {dist.get_global_device_count()} '
                f'({dist.get_world_size()} host processes)')
        if after_construct_launcher_callbacks is not None:
            for f in after_construct_launcher_callbacks:
                f(tl)
        tl.train_by_config(train_dl, self._config.train, test_dl)
        return dict(config=self._config, launcher=tl)

    def evaluate(self, after_construct_launcher_callbacks=None):
        """Eval-only entry (parity: ``trainer/trainer.py:121-144``)."""
        test_dl = self.make_dataloader(self._config.data.test)
        tl = self.build_launcher()
        if after_construct_launcher_callbacks is not None:
            for f in after_construct_launcher_callbacks:
                f(tl)
        first = next(iter(test_dl))
        tl.init_state(first if isinstance(first, (tuple, list)) else (first,))
        tl._maybe_load_init_weights()
        resumed = tl.init()
        if not resumed:
            # a wrong/empty model_dir would otherwise silently score a
            # randomly initialized model as if it were trained
            raise FileNotFoundError(
                f'no checkpoint found in {tl.model_dir!r}; evaluate() scores '
                'the last checkpoint — train first or point --model_dir at '
                'a trained run')
        return tl.evaluate(test_dl, self._config.get('train', None))


class SPMDTrainer(Trainer):
    """Mesh-parallel trainer (DDP replacement).

    Where ``THDDPTrainer`` does ``set_device`` + ``init_process_group('nccl')``
    + ``DistributedDataParallel(model)`` (``th_ddp_trainer.py:13-31``), here:
    one ``jax.sharding.Mesh`` over every chip; batch sharded on 'data';
    params replicated; XLA emits the gradient psum over ICI.  SyncBN needs no
    wrapper: batch-norm statistics over a sharded batch are global under jit.
    """

    def __init__(self, args):
        dist.init_dist_env()
        super().__init__(args)

    def make_mesh(self):
        return make_mesh(('data',))
