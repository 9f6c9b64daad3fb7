"""Launcher — the training engine (host-side orchestration).

Parity target: ``ever/core/launcher.py:31-438``.  The division of labor is
TPU-native: everything per-step on the device side is ONE jitted SPMD program
(built by ``ever_tpu/parallel/spmd.py``); the Launcher keeps the host-side
responsibilities of the reference hot loop (``launcher.py:248-367``):
iteration counting, per-step sampler reseeding, epoch-boundary callbacks,
checkpointing, logging with data-time/step-time decomposition, evaluation
dispatch, and resume.

Mixed precision: select 'fp32'|'bf16' (fp16+GradScaler is a GPU artifact —
bf16 keeps fp32 exponent range; parity note at SURVEY.md §5.9); the dtype is
injected into the model config by the trainer.
"""

from __future__ import annotations

import os
import time
import types
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from ever_tpu.core import dist
from ever_tpu.core.checkpoint import CheckPoint
from ever_tpu.core.config import AttrDict
from ever_tpu.core.iterator import get_iterator
from ever_tpu.core.logger import Logger
from ever_tpu.interface.callback import (
    Callback,
    EvaluationCallback,
    SaveCheckpointCallback,
)
from ever_tpu.parallel.mesh import batch_sharding, host_to_global
from ever_tpu.parallel.spmd import build_eval_step, build_train_step, create_train_state

__all__ = ['Launcher']


class Launcher:
    def __init__(self,
                 model_dir: str,
                 model,
                 optimizer,                       # built optax GradientTransformation
                 lr_schedule: Optional[Callable] = None,
                 mixed_precision: str = 'fp32',
                 mesh=None,
                 logger: Optional[Logger] = None,
                 seed: int = 42,
                 checkpoint_backend: str = 'msgpack'):
        self._model_dir = model_dir
        self._model = model
        self._tx = optimizer
        self._lr_schedule = lr_schedule
        self._mixed_precision = mixed_precision
        self._mesh = mesh
        self._seed = seed
        self._state = None
        self._train_step = None
        self._eval_step = None
        self._forward_times = 1
        self._callbacks: List[Callback] = []
        self._master = dist.is_main_process()
        if self._master and model_dir:
            os.makedirs(model_dir, exist_ok=True)
        self._logger = logger or Logger('ever_tpu', tensorboard_logdir=model_dir or None)
        self._ckpt = CheckPoint(self, backend=checkpoint_backend)
        self._evaluate_fn: Optional[Callable] = None
        self._init_params = None
        self._init_batch_stats = None
        self._stack_jits: Dict[Any, Callable] = {}

    # -- properties (parity: launcher.py:82-160) -----------------------------
    @property
    def model(self):
        return self._model

    unwrapped_model = model
    model_without_ddp = model

    @property
    def state(self):
        return self._state

    @property
    def optimizer(self):
        return self._tx

    @property
    def lr_schedule(self):
        return self._lr_schedule

    @property
    def model_dir(self) -> str:
        return self._model_dir

    @property
    def checkpoint(self) -> CheckPoint:
        return self._ckpt

    @property
    def global_step(self) -> int:
        return self._ckpt.global_step

    @property
    def lr(self) -> float:
        if self._lr_schedule is None:
            return 0.0
        return float(self._lr_schedule(self.global_step))

    @property
    def logger(self) -> Logger:
        return self._logger

    @property
    def mesh(self):
        return self._mesh

    @property
    def mixed_precision(self) -> str:
        return self._mixed_precision

    def info(self, msg: str) -> None:
        self._logger.info(msg)

    # -- state management ----------------------------------------------------
    def set_pretrained_state(self, params=None, batch_stats=None) -> None:
        """Params/batch_stats to overlay at init (pretrained weights,
        parity with ``init_from_weight_file``, ``interface/module.py:31-68``)."""
        self._init_params = params
        self._init_batch_stats = batch_stats

    def init_state(self, sample_batch) -> None:
        if self._state is not None:
            return
        state = create_train_state(
            self._model, self._tx, sample_batch,
            rng=jax.random.key(self._seed),
            init_params=self._init_params,
            init_batch_stats=self._init_batch_stats)
        if self._mesh is not None:
            from ever_tpu.parallel.mesh import replicated
            state = jax.device_put(state, replicated(self._mesh))
        self._state = state

    def restore_state(self, params, batch_stats, opt_state, global_step: int) -> None:
        if self._state is None:
            raise RuntimeError('init_state must run before restore_state')
        self._state = self._state.replace(
            step=np.int32(global_step),
            params=params, batch_stats=batch_stats, opt_state=opt_state)
        if self._mesh is not None:
            from ever_tpu.parallel.mesh import replicated
            self._state = jax.device_put(self._state, replicated(self._mesh))

    # -- callbacks (parity: launcher.py:186-191,239-246,295) -----------------
    def register_callback(self, *callbacks: Callback) -> None:
        for cb in callbacks:
            cb.set_launcher(self)
            self._callbacks.append(cb)

    register_callbacks = register_callback

    def run_callbacks(self, stage_name: str) -> None:
        for f in self._callbacks:
            if getattr(f, stage_name):
                if f.only_master:
                    if self._master:
                        f.func()
                else:
                    f.func()

    # -- evaluation (parity: launcher.py:413-426) ----------------------------
    def override_evaluate(self, fn: Callable) -> None:
        """Inject a user evaluation method: ``fn(self, dataloader, config)``."""
        self._evaluate_fn = types.MethodType(fn, self)

    def evaluate(self, data_loader, config=None):
        if self._evaluate_fn is None:
            fn = self._default_evaluate_fn(data_loader)
            if fn is None:
                self.info('no evaluate fn injected (override_evaluate); '
                          'skipping eval')
                return None
            self.override_evaluate(fn)   # route once, cache the closure
        return self._evaluate_fn(data_loader, config)

    def _default_evaluate_fn(self, data_loader):
        """Standard eval auto-wiring when the model declares a class count.

        The torch reference raises NotImplementedError until the user wires
        ``evaluate_pixel_prediction_task`` through ``override_evaluate``
        (``launcher.py:422-426``); for the common workflows the class count
        is already in the model config and the task is identifiable from
        the label structure of ONE dataset sample, so ``eval_after_train``
        works out of the box: plain mask → pixel task, ``{'change', ...}``
        → binary change detection, ``{'loc','damage'}`` → damage
        assessment.  Routed once and cached via ``override_evaluate``;
        custom tasks still override."""
        cfg = getattr(self._model, 'config', None)
        if cfg is None:
            return None
        classes = cfg.get('classes', None) or cfg.get('num_classes', None)
        damage_classes = cfg.get('damage_classes', None)
        if not classes and not damage_classes:
            return None
        import jax
        if jax.process_count() > 1:
            # the auto closures run a global-mesh jitted eval step, but the
            # eval callback gates on the master process — injecting here
            # would leave rank 0 alone inside a collective (the same hazard
            # _collective_save_backend documents for orbax saves). Wire
            # distributed_evaluate_pixel_prediction_task explicitly with
            # train.distributed_evaluate=True on pods.
            self.info('multi-host run: auto eval is disabled — wire a '
                      'distributed evaluate fn via override_evaluate')
            return None
        # probe ONE dataset sample (not a collated batch; nothing consumed)
        ds = getattr(data_loader, 'dataset', None)
        sample = None
        try:
            if ds is not None and len(ds) > 0:
                sample = ds[0]
        except TypeError:
            pass
        if sample is None:
            self.info('cannot inspect eval labels (loader exposes no sized '
                      'dataset); wire a fn via override_evaluate')
            return None
        y = (sample[1] if isinstance(sample, (tuple, list))
             and len(sample) > 1 else None)
        from ever_tpu.metric import evaluate_fn as E
        if isinstance(y, dict) and 'damage' in y and damage_classes:
            self.info(f'auto-injecting damage-assessment eval '
                      f'(damage_classes={damage_classes}); use '
                      'override_evaluate for custom evaluation')
            return E.evaluate_damage_assessment_task(int(damage_classes))
        if isinstance(y, dict) and 'change' in y:
            self.info('auto-injecting binary change-detection eval; use '
                      'override_evaluate for custom evaluation')
            return E.evaluate_change_detection_task()
        if hasattr(y, 'shape') and classes:
            self.info(f'auto-injecting pixel-prediction eval '
                      f'(classes={classes}); use override_evaluate for '
                      'custom evaluation')
            return E.evaluate_pixel_prediction_task(int(classes))
        self.info(f'eval labels are {type(y).__name__}; no auto eval '
                  'applies — wire a custom fn via override_evaluate. '
                  'Skipping eval.')
        return None

    def evaluate_last_ckpt(self, data_loader, config=None):
        # resume needs a live state to restore into; bootstrap from the
        # loader's element spec (no training has run when this is the entry)
        if self._state is None:
            self._bootstrap_state(data_loader)
            self._maybe_load_init_weights()
        self.init()
        return self.evaluate(data_loader, config)

    # -- jitted steps --------------------------------------------------------
    def _ensure_train_step(self, forward_times: int) -> None:
        # K-step loops are built (and cached per K) by _train_loop_k; this
        # cache only ever holds the single-step program
        if self._train_step is None or self._forward_times != forward_times:
            self._forward_times = forward_times
            self._train_step = build_train_step(
                self._model, self._tx, self._lr_schedule,
                forward_times=forward_times, mesh=self._mesh,
                rng_seed=self._seed)

    def get_eval_step(self, local: bool = False):
        """The jitted eval step.  ``local=True`` returns a step bound to THIS
        process's devices only — required for disjoint-partition distributed
        eval, where ranks iterate different batch counts: a global-mesh SPMD
        program would deadlock on the rank with fewer batches."""
        if local and self._mesh is not None and jax.process_count() > 1:
            if getattr(self, '_eval_step_local', None) is None:
                self._local_mesh = jax.sharding.Mesh(
                    np.asarray(jax.local_devices()), ('data',))
                self._eval_step_local = build_eval_step(self._model,
                                                        mesh=self._local_mesh)
            return self._eval_step_local
        if self._eval_step is None:
            self._eval_step = build_eval_step(self._model, mesh=self._mesh)
        return self._eval_step

    def local_state(self):
        """The train state staged on this process's devices (for
        :meth:`get_eval_step` ``local=True``).  Requires replicated state —
        ZeRO-sharded state has no full local copy.  Only the fields eval
        reads (params / batch_stats / step) round-trip through the host;
        the optimizer state — the largest piece under Adam — stays put."""
        if self._mesh is None or jax.process_count() == 1:
            return self.state
        self.get_eval_step(local=True)   # ensure self._local_mesh
        from ever_tpu.parallel.mesh import replicated as _repl
        from ever_tpu.parallel.spmd import TrainState
        sh = _repl(self._local_mesh)

        def pull(a):
            if not isinstance(a, jax.Array):
                # host leaf (e.g. numpy params straight from a weight file)
                return jax.device_put(np.asarray(a), sh)
            if not a.is_fully_replicated:
                raise ValueError(
                    'local_state() needs a replicated train state; this '
                    'state is sharded (ZeRO?) — evaluate with the global '
                    'mesh instead')
            return jax.device_put(np.asarray(a.addressable_data(0)), sh)

        s = self.state
        return TrainState(step=pull(s.step),
                          params=jax.tree.map(pull, s.params),
                          batch_stats=jax.tree.map(pull, s.batch_stats),
                          opt_state=())

    # -- training loop (parity: launcher.py:248-367) -------------------------
    def train_iters(self, train_data_loader, test_data_loader=None, **kwargs):
        num_iters = kwargs.get('num_iters', -1)
        if num_iters <= 0:
            raise ValueError('num_iters must be positive')
        forward_times = kwargs.get('forward_times', 1)
        steps_per_loop = int(kwargs.get('steps_per_loop', 1))
        eval_per_epoch = kwargs.get('eval_per_epoch', False)
        eval_interval_epoch = kwargs.get('eval_interval_epoch', -1)
        eval_after_train = kwargs.get('eval_after_train', False)
        log_interval_step = kwargs.get('log_interval_step', 1)
        iterator_type = kwargs.get('iterator_type', 'normal')
        save_ckpt_interval_epoch = kwargs.get('save_ckpt_interval_epoch', 1)
        dist_eval = kwargs.get('distributed_evaluate', False)
        distributed = kwargs.get('distributed', True)
        profile_dir = kwargs.get('profile_dir', None)
        profile_steps = kwargs.get('profile_steps', (10, 20))
        self._summary_weights = kwargs.get('summary_weights', False)
        self._tensorboard_interval = kwargs.get('tensorboard_interval_step', 100)

        batch_sh = None
        if self._mesh is not None:
            batch_sh = batch_sharding(self._mesh,
                                      accum_leading=forward_times > 1)
        it_cls = get_iterator(iterator_type)
        # the prefetched iterator must stage batches in the TRAINING sharding
        # — prefetching to the default device then re-putting per step defeats
        # the prefetch (and round-trips through the host multi-process).
        # Each prefetched item is ONE batch, so it always stages with the
        # per-batch (non-accum) sharding; grad-accum / steps-per-loop stacking
        # happens on device afterwards (_stack_batches).
        iterator = (it_cls(train_data_loader,
                           sharding=(batch_sharding(self._mesh)
                                     if self._mesh is not None else None))
                    if iterator_type == 'prefetched'
                    else it_cls(train_data_loader))
        # resumed (or staged) training: dataset-epoch RNGs continue from the
        # checkpoint step instead of replaying epoch 0
        iterator.set_start_step(self._ckpt.global_step)

        # drop auto-registered callbacks from a PREVIOUS train_iters call
        # (staged training / retry would otherwise save+evaluate twice per
        # epoch); user-registered callbacks are kept
        self._callbacks = [cb for cb in self._callbacks
                           if not getattr(cb, '_auto_registered', False)]
        save_cb = SaveCheckpointCallback(save_ckpt_interval_epoch)
        save_cb._auto_registered = True
        self.register_callback(save_cb)
        if eval_per_epoch or eval_after_train:
            if eval_per_epoch and eval_interval_epoch <= 0:
                # 0 used to pass validation and then be silently skipped by
                # run_callbacks' interval <= 0 guard — no eval ever ran
                raise ValueError('eval_interval_epoch must be positive when '
                                 'eval_per_epoch = True')
            if not eval_per_epoch and eval_interval_epoch > 0:
                raise ValueError('eval_per_epoch should be True when '
                                 'eval_interval_epoch > 0')
            eval_cb = EvaluationCallback(
                test_data_loader, eval_interval_epoch, not dist_eval,
                config=AttrDict(kwargs), after_train=eval_after_train)
            eval_cb._auto_registered = True
            self.register_callback(eval_cb)
        self._callbacks.sort(key=lambda cb: cb.prior)

        self.run_callbacks('before_train')
        self._logger.forward_times_log(forward_times)

        sharding = batch_sh

        pending = None   # (step_idx, metrics, data_time, t_start) of the async step
        try:
            if steps_per_loop > 1:
                self._train_loop_k(iterator, num_iters, steps_per_loop,
                                   distributed, log_interval_step, sharding,
                                   profile_dir, profile_steps,
                                   forward_times=forward_times)
            else:
                self._train_loop(iterator, num_iters, forward_times, distributed,
                                 log_interval_step, sharding, pending,
                                 profile_dir, profile_steps)
        except (KeyboardInterrupt, Exception):
            # crash-save: make the interrupted step resumable (additive over
            # the reference's resume-from-last-periodic-save posture).
            # NEVER from one rank of a multi-process run with a collective
            # (orbax) backend: only the raising rank is here, and entering
            # the cross-host barrier alone wedges the pod (the same hazard
            # _collective_save_backend documents for gated saves)
            collective = (self._ckpt.backend.startswith('orbax')
                          and jax.process_count() > 1)
            if (self._state is not None and self._ckpt.global_step > 0
                    and not collective):
                try:
                    self._ckpt.save()
                    self.info(f'crash-saved checkpoint at step {self._ckpt.global_step}')
                except Exception:
                    pass
            elif collective:
                self.info('skipping crash-save (collective checkpoint '
                          'backend on a multi-process run); resume from the '
                          'last periodic save')
            raise
        self.run_callbacks('after_train')
        self._logger.after_train()

    def _train_loop(self, iterator, num_iters, forward_times, distributed,
                    log_interval_step, sharding, pending,
                    profile_dir=None, profile_steps=(10, 20)):
        profiling = False
        while self._ckpt.global_step < num_iters:
            # optional XLA trace capture over [profile_steps) — the analog of
            # the reference's record_function NVTX regions (launcher.py:305,316)
            if profile_dir and not profiling and \
                    self._ckpt.global_step == profile_steps[0]:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            if profiling and self._ckpt.global_step >= profile_steps[1]:
                jax.profiler.stop_trace()
                profiling = False
                self.info(f'profile trace written to {profile_dir}')
            t0 = time.time()
            if distributed:
                iterator.set_seed_for_dist_sampler(self._ckpt.global_step)
            with jax.profiler.TraceAnnotation('load_data'):
                data_list = iterator.next(forward_times, call_backs=self._callbacks,
                                          is_master=self._master)
                batch = self._stack_microbatches(data_list, forward_times,
                                                 accum_sh=sharding)
                # async H2D: dispatch is non-blocking, so while the device
                # runs step N the host loop is already transferring N+1
                batch = (host_to_global(batch, sharding) if sharding is not None
                         else jax.device_put(batch))
            data_time = time.time() - t0

            if self._state is None:
                sample = (jax.tree.map(lambda x: x[0], batch)
                          if forward_times > 1 else batch)
                self.init_state(sample)
                self._maybe_load_init_weights()
            self._ensure_train_step(forward_times)

            with jax.profiler.StepTraceAnnotation(
                    'train', step_num=self._ckpt.global_step):
                self._state, metrics = self._train_step(self._state, batch)
            self._ckpt.step()
            step = self._ckpt.global_step

            # log the *previous* step's (now materialised) metrics so the
            # device_get doesn't serialise dispatch (async dispatch parity
            # with the CUDA stream overlap the reference relies on)
            if pending is not None and (pending[0] % log_interval_step == 0):
                self._log_step(pending, num_iters)
            if getattr(self, '_summary_weights', False) and \
                    step % self._tensorboard_interval == 0:
                self._logger.log_histograms(self._state.params, step)
            pending = (step, metrics, data_time, time.time() - t0)

        if profiling:
            jax.profiler.stop_trace()
            self.info(f'profile trace written to {profile_dir}')
        if pending is not None:
            self._log_step(pending, num_iters)

    def _train_loop_k(self, iterator, num_iters, steps_per_loop,
                      distributed, log_interval_step, sharding,
                      profile_dir=None, profile_steps=(10, 20),
                      forward_times=1):
        """K optimizer steps per dispatch (``train.steps_per_loop``).

        The host stages K batches (firing epoch callbacks / per-step sampler
        reseeds while staging), the device scans K full train steps in one
        XLA program (``spmd.build_train_loop``).  Amortizes per-dispatch host
        latency; metrics are logged once per dispatch (K-step means).

        With ``forward_times > 1`` each staged step is itself a stack of
        microbatches (leaves ``[K, forward_times, batch, ...]``) and the
        device program is a scan of gradient-accumulation scans — K-loop
        amortization and accumulation compose (VERDICT r4 #4).
        """
        from ever_tpu.parallel.spmd import build_train_loop
        loops: Dict[int, Callable] = {}
        # leading axes are steps (and microbatch) indices, not batch —
        # shard the axis after them
        micro_sh = None
        if self._mesh is not None:
            sharding = batch_sharding(
                self._mesh, accum_leading=1 + int(forward_times > 1))
            if forward_times > 1:
                micro_sh = batch_sharding(self._mesh, accum_leading=True)
        pending = None
        profiling = False
        while self._ckpt.global_step < num_iters:
            # same trace-capture window as _train_loop (start/stop at
            # dispatch granularity — the window snaps to K multiples)
            if profile_dir and not profiling and \
                    self._ckpt.global_step >= profile_steps[0]:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            if profiling and self._ckpt.global_step >= profile_steps[1]:
                jax.profiler.stop_trace()
                profiling = False
                self.info(f'profile trace written to {profile_dir}')
            k = min(steps_per_loop, num_iters - self._ckpt.global_step)
            t0 = time.time()
            with jax.profiler.TraceAnnotation('load_data'):
                stage = []
                for i in range(k):
                    if distributed:
                        iterator.set_seed_for_dist_sampler(
                            self._ckpt.global_step + i)
                    data_list = iterator.next(forward_times,
                                              call_backs=self._callbacks,
                                              is_master=self._master)
                    stage.append(self._stack_microbatches(
                        data_list, forward_times, accum_sh=micro_sh))
                batch = self._stack_batches(stage, accum_sh=sharding)
                batch = (host_to_global(batch, sharding) if sharding is not None
                         else jax.device_put(batch))
            data_time = time.time() - t0

            if self._state is None:
                sample = jax.tree.map(lambda x: x[0], batch)
                if forward_times > 1:
                    sample = jax.tree.map(lambda x: x[0], sample)
                self.init_state(sample)
                self._maybe_load_init_weights()
            if k not in loops:
                # the final partial window compiles its own (smaller) loop;
                loops[k] = build_train_loop(
                    self._model, self._tx, self._lr_schedule,
                    steps_per_loop=k, forward_times=forward_times,
                    mesh=self._mesh, rng_seed=self._seed)

            with jax.profiler.StepTraceAnnotation(
                    'train', step_num=self._ckpt.global_step):
                self._state, metrics = loops[k](self._state, batch)
            for _ in range(k):
                self._ckpt.step()
            step = self._ckpt.global_step
            if pending is not None and (pending[0] % log_interval_step == 0
                                        or steps_per_loop > log_interval_step):
                self._log_step(pending, num_iters)
            # the dispatch spans k optimizer steps — log PER-STEP times or the
            # smoothed time/step and ETA read k× too large
            pending = (step, metrics, data_time / k, (time.time() - t0) / k)
        if profiling:
            jax.profiler.stop_trace()
            self.info(f'profile trace written to {profile_dir}')
        if pending is not None:
            self._log_step(pending, num_iters)

    def _maybe_load_init_weights(self) -> None:
        """Apply config.GLOBAL.weight.path if the model carries one
        (parity: ``interface/module.py:31-68`` via builder path)."""
        gcfg = getattr(self._model, 'global_config', None)
        if not gcfg:
            return
        weight = gcfg.get('weight', None)
        if not weight or not weight.get('path', None):
            return
        from ever_tpu.util import weight_io
        params, batch_stats = weight_io.load_weights(
            weight['path'], self._state.params, self._state.batch_stats,
            excepts=weight.get('excepts', None))
        self._state = self._state.replace(params=params, batch_stats=batch_stats)
        self.info(f"loaded init weights from {weight['path']}")

    def _stack_microbatches(self, data_list, forward_times: int, accum_sh=None):
        if forward_times == 1:
            return data_list[0]
        return self._stack_batches(data_list, accum_sh)

    def _stack_batches(self, batches, accum_sh=None):
        """Stack per-step/microbatch pytrees along a new leading axis.

        Host (numpy) batches stack on host; device-staged (prefetched)
        batches stack ON DEVICE in one tiny jitted program with the
        accum-leading sharding — ``np.stack`` on them would silently fetch
        every prefetched array back to host (and, multi-process, raise on
        non-addressable shards)."""
        leaves = jax.tree.leaves(batches[0])
        if leaves and isinstance(leaves[0], jax.Array):
            import jax.numpy as jnp
            key = (len(batches), accum_sh)
            fn = self._stack_jits.get(key)
            if fn is None:
                def stack(*xs):
                    return jax.tree.map(lambda *a: jnp.stack(a), *xs)
                fn = (jax.jit(stack, out_shardings=accum_sh)
                      if accum_sh is not None else jax.jit(stack))
                self._stack_jits[key] = fn
            return fn(*batches)
        return jax.tree.map(lambda *xs: np.stack(xs), *batches)

    def _log_step(self, pending, num_iters: int) -> None:
        step, metrics, data_time, time_cost = pending
        host_metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
        lr = host_metrics.pop('learning_rate', self.lr)
        self._logger.train_log(step, num_iters, host_metrics, data_time,
                               time_cost, lr)

    # -- config-driven entry (parity: launcher.py:369-408) -------------------
    def train_by_config(self, train_data_loader, config, test_data_loader=None):
        cfg = dict(config)
        resume_from_last = cfg.get('resume_from_last', True)
        # state must exist before resume; bootstrap from the loader's element
        # spec WITHOUT consuming a batch (the reference restores without
        # touching data, ``ever/core/checkpoint.py:84-117`` — consuming one
        # here would silently shift step-0 data order vs the no-resume path)
        if resume_from_last and self._state is None:
            self._bootstrap_state(train_data_loader)
            self._maybe_load_init_weights()
        if resume_from_last:
            self.init()
        self.train_iters(train_data_loader, test_data_loader, **cfg)

    def _bootstrap_state(self, train_data_loader) -> None:
        """Init state from a batch-1 spec sample fetched by index (param and
        batch_stats shapes are batch-size independent), leaving the loader's
        iteration order untouched."""
        dataset = getattr(train_data_loader, 'dataset', None)
        collate = getattr(train_data_loader, 'collate_fn', None)
        if dataset is not None:
            try:
                item = dataset[0]
            except Exception:
                item = None
            if item is not None:
                if collate is None:
                    from ever_tpu.data.loader import default_collate as collate
                self.init_state(collate([item]))
                return
        # loaders without an indexable dataset: fall back to consuming one.
        # Starting the sampler's __iter__ may advance per-pass RNG state
        # (RandomSampler auto-advances its epoch) — snapshot and restore so
        # the probe can't shift training's first permutation vs no-resume.
        sampler = getattr(train_data_loader, 'sampler', None)
        epoch_before = getattr(sampler, 'epoch', None)
        try:
            self.init_state(next(iter(train_data_loader)))
        finally:
            if epoch_before is not None:
                sampler.epoch = epoch_before

    def init(self) -> bool:
        """Resume from the last checkpoint if one exists."""
        return self._ckpt.try_resume()

    def save_model(self, filename: Optional[str] = None) -> None:
        self._ckpt.save(filename or 'model-saved.ckpt')


def scale_dict(input_dict: dict, scale) -> dict:
    """Scale every value (parity: ``ever/core/launcher.py:429-432``)."""
    for k, v in input_dict.items():
        input_dict[k] = v * scale
    return input_dict


def average_dict(input_dict: dict) -> dict:
    """Mean-reduce non-scalar values (parity: ``ever/core/launcher.py:435-438``)."""
    for k, v in input_dict.items():
        input_dict[k] = v.mean() if getattr(v, 'ndim', 0) != 0 else v
    return input_dict


__all__ += ['scale_dict', 'average_dict']
