"""REAL multi-process validation of the distributed training path.

The reference's distributed story is `torchrun --nproc_per_node=N train.py`
(NCCL init `ever/trainer/th_ddp_trainer.py:14-17`, rank samplers
`ever/data/distributed.py`, loss reduce `ever/core/dist.py:118-140`).  Ours is
`jax.distributed.initialize` + one global mesh.  Single-process tests fake N
devices; THIS tool runs the full trainer across N actual OS processes over the
Gloo-backed CPU cluster (2 fake devices per process), exercising for real:

- ``dist.init_dist_env`` → ``jax.distributed.initialize`` (coordinator/rank)
- ``ERDataLoader`` ``total_batch_size // process_count`` semantics
- ``StepDistributedSampler`` rank sharding (disjoint per-process batches)
- ``parallel.mesh.host_to_global`` → ``make_array_from_process_local_data``
- the jitted SPMD train step over a global mesh spanning processes
  (gradient sync is the compiler-inserted psum — DDP's all-reduce analog)
- main-process-only checkpointing + cross-process barrier
- host collectives: ``all_gather``, ``reduce_loss_dict``, ``broadcast``

Usage:
    python tools/multiprocess_validation.py --launch      # spawns 2 workers
    python tools/multiprocess_validation.py PID NPROC DIR # one worker

The launcher compares the 2-process loss trajectory against a single-process
run of the SAME global batch schedule — they must agree to fp32 tolerance
(global BN stats + global grad mean are device-layout invariant).
"""

import json
import os
import subprocess
import sys
import tempfile

# worker subprocesses may start from any cwd; don't depend on the editable
# install surviving environment resets
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

PORT = 29517
STEPS = 4
GLOBAL_BATCH = 8
IMG = 32
CLASSES = 4


def _write_config(path: str, steps: int) -> None:
    with open(path, 'w') as f:
        f.write(f"""
config = dict(
    model=dict(type='MPValSeg', params=dict(classes={CLASSES}, width=8)),
    data=dict(train=dict(type='mpval_synth',
                         params=dict(num_samples=32, image_size={IMG},
                                     total_batch_size={GLOBAL_BATCH}))),
    learning_rate=dict(type='poly',
                       params=dict(base_lr=0.05, power=0.9, max_iters={steps})),
    optimizer=dict(type='sgd', params=dict(momentum=0.9),
                   grad_clip=dict(max_norm=35.0)),
    train=dict(num_iters={steps}, forward_times=1, eval_per_epoch=False,
               eval_after_train=False, log_interval_step=1,
               save_ckpt_interval_epoch=1),
)
""")


def _register():
    import numpy as np
    import jax.numpy as jnp
    import flax.linen as nn
    from ever_tpu import ERDataset, ERModule
    from ever_tpu.core import registry
    from ever_tpu.module.loss import softmax_ce_loss_with_logits

    if 'MPValSeg' in registry.MODEL:
        return

    @registry.MODEL.register('MPValSeg')
    class MPValSeg(ERModule):
        def set_default_config(self):
            self.config.update(dict(classes=CLASSES, width=8))

        import flax.linen as _nn

        @_nn.compact
        def __call__(self, x, y=None, train=False):
            h = nn.Conv(self.config.width, (3, 3), padding='SAME')(x)
            h = nn.BatchNorm(use_running_average=not train, name='bn')(h)
            h = nn.relu(h)
            logits = nn.Conv(self.config.classes, (1, 1))(h)
            if train:
                return dict(cls_loss=softmax_ce_loss_with_logits(logits, y))
            return jnp.argmax(logits, -1)

    @registry.DATASET.register('mpval_synth')
    class MPValSynth(ERDataset):
        def set_default_config(self):
            self._config.update(dict(num_samples=32, image_size=IMG, seed=0))

        def __len__(self):
            return self.config.num_samples

        def __getitem__(self, idx):
            rng = np.random.default_rng(1000 + int(idx))
            s = self.config.image_size
            return (rng.normal(size=(s, s, 3)).astype(np.float32),
                    rng.integers(0, CLASSES, size=(s, s)).astype(np.int32))


def worker(pid: int, nproc: int, workdir: str) -> None:
    os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=2')
    os.environ['EVER_COMPILE_CACHE'] = '0'
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from ever_tpu.core import dist
    if nproc > 1:
        dist.init_dist_env(f'localhost:{PORT}', nproc, pid)
        assert jax.process_count() == nproc, jax.process_count()
        assert dist.get_world_size() == nproc
        assert dist.get_rank() == pid

    _register()
    import numpy as np

    # host collectives across real processes
    gathered = dist.all_gather({'rank': float(pid)})
    assert [g['rank'] for g in gathered] == [float(i) for i in range(nproc)]
    reduced = dist.reduce_loss_dict({'l': float(pid)})
    if dist.is_main_process() and nproc > 1:
        assert abs(reduced['l'] - (nproc - 1) / 2) < 1e-6, reduced
    b = dist.broadcast_one_to_all(np.asarray([42.0 + pid]))
    assert float(np.asarray(b)[0]) == 42.0  # process 0's value everywhere

    cfg_path = os.path.join(workdir, 'config.py')
    model_dir = os.path.join(workdir, f'run_np{nproc}')
    from ever_tpu.core.logger import TrainLogHook
    from ever_tpu.trainer import get_trainer

    class Capture(TrainLogHook):
        def __init__(self):
            self.losses = []

        def after_iter(self, global_step, loss_dict, learning_rate):
            self.losses.append(float(loss_dict['cls_loss']))

    cap = Capture()
    trainer = get_trainer('th_ddp', argv=['--config_path', cfg_path,
                                          '--model_dir', model_dir])()
    result = trainer.run(after_construct_launcher_callbacks=[
        lambda launcher: launcher.logger.register_train_log_hook(cap)])
    launcher = result['launcher']
    assert launcher.global_step == STEPS

    losses = cap.losses
    dist.synchronize()
    # every process must have seen identical global losses
    all_losses = dist.all_gather(losses)
    for other in all_losses:
        np.testing.assert_allclose(other, losses, rtol=1e-5)

    # distributed eval over an ODD sample count: ranks get UNEQUAL batch
    # counts (5 vs 4 here), which deadlocks a global-mesh SPMD eval step —
    # must run on each process's local devices with host CM gather
    # (parity: ever/metric/evaluate_fn.py:62-127 independent rank forwards)
    from ever_tpu.core import registry
    from ever_tpu.data.loader import DataLoader
    from ever_tpu.metric.evaluate_fn import (
        distributed_evaluate_pixel_prediction_task)
    eval_ds = registry.DATASET['mpval_synth'](
        dict(num_samples=9, image_size=IMG))
    eval_loader = DataLoader(eval_ds, batch_size=2)
    launcher.override_evaluate(
        distributed_evaluate_pixel_prediction_task(CLASSES))
    acc_tb = launcher.evaluate(eval_loader, None)
    oa = next(float(r[1]) for r in acc_tb._rows if r[0] == 'OA')

    if dist.is_main_process():
        ckpts = [f for f in os.listdir(model_dir) if f.startswith('checkpoint-')]
        out = dict(nproc=nproc, losses=losses, n_ckpts=len(ckpts),
                   eval_oa=oa,
                   devices=len(jax.devices()),
                   local_devices=len(jax.local_devices()))
        with open(os.path.join(workdir, f'result_np{nproc}.json'), 'w') as f:
            json.dump(out, f)
        print(f'[p{pid}] OK: {out}', flush=True)
    dist.synchronize()


def launch() -> None:
    workdir = tempfile.mkdtemp(prefix='mpval_')
    _write_config(os.path.join(workdir, 'config.py'), STEPS)
    me = os.path.abspath(__file__)

    # 2-process run (2x2 = 4 global devices)
    procs = [subprocess.Popen([sys.executable, me, str(pid), '2', workdir])
             for pid in range(2)]
    rcs = [p.wait(timeout=600) for p in procs]
    assert rcs == [0, 0], f'worker rcs: {rcs}'

    # single-process reference of the same global schedule (4 fake devices
    # so the mesh size matches; trajectory must be identical either way)
    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    rc = subprocess.run([sys.executable, me, '0', '1', workdir],
                        env=env, timeout=600).returncode
    assert rc == 0

    with open(os.path.join(workdir, 'result_np2.json')) as f:
        multi = json.load(f)
    with open(os.path.join(workdir, 'result_np1.json')) as f:
        single = json.load(f)
    import numpy as np
    np.testing.assert_allclose(multi['losses'], single['losses'],
                               rtol=2e-4, atol=1e-6)
    assert multi['devices'] == 4 and multi['local_devices'] == 2
    assert multi['eval_oa'] is not None and single['eval_oa'] is not None
    np.testing.assert_allclose(multi['eval_oa'], single['eval_oa'], atol=2e-5)
    print('MULTIPROCESS VALIDATION OK')
    print('  2-process losses :', [round(l, 6) for l in multi['losses']])
    print('  1-process losses :', [round(l, 6) for l in single['losses']])
    print('  distributed eval OA (9 samples, uneven 5/4 partition):',
          multi['eval_oa'], '== single-process', single['eval_oa'])
    print(f'  checkpoints written once: {multi["n_ckpts"]} (main process only)')
    print('  result dir:', workdir)


if __name__ == '__main__':
    if '--launch' in sys.argv:
        launch()
    else:
        worker(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
