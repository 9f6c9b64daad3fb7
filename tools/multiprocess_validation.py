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
    python tools/multiprocess_validation.py --launch         # 2-proc trainer
    python tools/multiprocess_validation.py --launch-hybrid  # 4-proc hybrid
    python tools/multiprocess_validation.py PID NPROC DIR    # one worker

``--launch`` compares the 2-process loss trajectory against a single-process
run of the SAME global batch schedule — they must agree to fp32 tolerance
(global BN stats + global grad mean are device-layout invariant).

``--launch-hybrid`` (VERDICT r2 #6) is the closest available proxy for a
multi-slice pod: 4 processes × 2 fake devices over a
``make_hybrid_mesh(('data','model'), (4,2))`` mesh, batch sharded jointly
over (data × model), **ZeRO-1** optimizer-state sharding across the
process-spanning 'data' axis, a **collective orbax save** at step 2, worker
exit ("kill"), then 4 FRESH processes restore and finish — the stitched
trajectory must equal a single-process 8-device run of all 4 steps.  It also
re-runs the full-trainer worker at 4 processes (uneven 3/2/2/2 distributed
eval partitions).
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


def _hybrid_batches(steps: int):
    import numpy as np
    rng = np.random.default_rng(5)
    xs = rng.normal(size=(steps, GLOBAL_BATCH, IMG, IMG, 3)).astype(np.float32)
    ys = rng.integers(0, CLASSES,
                      size=(steps, GLOBAL_BATCH, IMG, IMG)).astype(np.int32)
    return xs, ys


def hybrid_worker(pid: int, nproc: int, workdir: str, phase: str) -> None:
    """One hybrid-mesh worker: ZeRO-1 over the process-spanning 'data' axis,
    batch sharded over (data × model), collective orbax save/restore.

    ``phase``: 'train' (steps 1-2 + collective save, then exit),
    'resume' (fresh processes restore the sharded state and run steps 3-4),
    'single' (one process, 8 fake devices, all 4 steps — the reference)."""
    ndev = 8 if nproc == 1 else 2
    os.environ['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={ndev}'
    os.environ['EVER_COMPILE_CACHE'] = '0'
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from ever_tpu.core import dist
    if nproc > 1:
        # distinct port per phase: the resume cluster starts seconds after
        # the train cluster exits and must not race its TIME_WAIT socket
        port = PORT + (2 if phase == 'train' else 3)
        dist.init_dist_env(f'localhost:{port}', nproc, pid)
        assert jax.device_count() == 8

    _register()
    import jax.numpy as jnp
    import numpy as np
    from ever_tpu.core import builder, registry
    from ever_tpu.core.checkpoint import CheckPoint
    from ever_tpu.parallel.mesh import (NamedSharding, P, host_to_global,
                                        make_hybrid_mesh)
    from ever_tpu.parallel.spmd import build_train_step, create_train_state
    from ever_tpu.parallel.zero import zero_init

    steps_total = 4
    mesh = make_hybrid_mesh(ici_axes=('data', 'model'), ici_shape=(4, 2))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        'replica': 1, 'data': 4, 'model': 2}, mesh

    model = registry.MODEL['MPValSeg'](dict(classes=CLASSES, width=8))
    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.05, power=0.9,
                                        max_iters=steps_total)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule, grad_clip=dict(max_norm=35.0))

    xs, ys = _hybrid_batches(steps_total)
    state = create_train_state(model, tx, (xs[0], ys[0]),
                               rng=jax.random.key(0))
    z_state, z_sh = zero_init(jax.device_get(state), mesh, level=1)
    step = build_train_step(model, tx, schedule, mesh=mesh, donate=False,
                            state_shardings=z_sh,
                            batch_axis=('data', 'model'))
    batch_sh = NamedSharding(mesh, P(('data', 'model')))
    ckpt_dir = os.path.join(workdir, 'hybrid_ckpt')

    def run_steps(z_state, lo, hi):
        losses = []
        for i in range(lo, hi):
            # each process contributes ITS OWN rows of the global batch
            rows = slice(pid * (GLOBAL_BATCH // nproc),
                         (pid + 1) * (GLOBAL_BATCH // nproc))
            batch = host_to_global((xs[i][rows], ys[i][rows]), batch_sh)
            z_state, metrics = step(z_state, batch)
            losses.append(float(metrics['cls_loss']))
        return z_state, losses

    if phase in ('train', 'single'):
        z_state, losses = run_steps(z_state, 0, 2)
        # collective orbax save: every process participates (sharded leaves
        # are written by their owning processes)
        import orbax.checkpoint as ocp
        ocp.PyTreeCheckpointer().save(
            os.path.abspath(ckpt_dir) + ('_single' if nproc == 1 else ''),
            dict(model=dict(params=z_state.params,
                            batch_stats=z_state.batch_stats),
                 opt=z_state.opt_state, step=2),
            force=True)
        if phase == 'single':
            z_state, more = run_steps(z_state, 2, 4)
            losses += more
    else:                                      # resume in FRESH processes
        # template from the PRE-zero_init state: z_state leaves span other
        # processes' devices and cannot be device_get on one host
        template = jax.device_get(
            dict(model=dict(params=state.params,
                            batch_stats=state.batch_stats),
                 opt=state.opt_state, step=0))
        ckpt = CheckPoint.load(ckpt_dir, template)
        assert int(ckpt['step']) == 2
        z_state = z_state.replace(
            step=jnp.asarray(2, jnp.int32),
            params=ckpt['model']['params'],
            batch_stats=ckpt['model']['batch_stats'],
            opt_state=ckpt['opt'])
        z_state = jax.device_put(z_state, z_sh)
        z_state, losses = run_steps(z_state, 2, 4)

    dist.synchronize()
    if dist.is_main_process():
        # prove the optimizer state really is sharded across processes
        sharded = any(
            hasattr(l, 'sharding') and not l.sharding.is_fully_replicated
            for l in jax.tree.leaves(z_state.opt_state))
        tag = 'single' if nproc == 1 else phase
        with open(os.path.join(workdir, f'hybrid_{tag}.json'), 'w') as f:
            json.dump(dict(losses=losses, opt_is_sharded=sharded), f)
        print(f'[hybrid p{pid}/{phase}] losses={losses}', flush=True)
    dist.synchronize()


def launch_hybrid() -> None:
    workdir = tempfile.mkdtemp(prefix='mpval_hybrid_')
    _write_config(os.path.join(workdir, 'config.py'), STEPS)
    me = os.path.abspath(__file__)
    import numpy as np

    # phase 1: 4 processes train 2 steps, collective orbax save, exit
    for phase in ('train', 'resume'):
        procs = [subprocess.Popen(
            [sys.executable, me, str(pid), '4', workdir, '--hybrid', phase])
            for pid in range(4)]
        rcs = [p.wait(timeout=600) for p in procs]
        assert rcs == [0] * 4, f'hybrid {phase} worker rcs: {rcs}'

    # reference: one process, 8 fake devices, same 4 steps
    rc = subprocess.run([sys.executable, me, '0', '1', workdir,
                         '--hybrid', 'single'], timeout=600).returncode
    assert rc == 0

    with open(os.path.join(workdir, 'hybrid_train.json')) as f:
        first = json.load(f)
    with open(os.path.join(workdir, 'hybrid_resume.json')) as f:
        second = json.load(f)
    with open(os.path.join(workdir, 'hybrid_single.json')) as f:
        single = json.load(f)
    stitched = first['losses'] + second['losses']
    np.testing.assert_allclose(stitched, single['losses'],
                               rtol=2e-4, atol=1e-6)
    assert first['opt_is_sharded'] and second['opt_is_sharded'], \
        'ZeRO-1 optimizer state was not actually sharded'

    # full-trainer path at 4 processes (uneven 3/2/2/2 eval partitions)
    procs = [subprocess.Popen([sys.executable, me, str(pid), '4', workdir])
             for pid in range(4)]
    rcs = [p.wait(timeout=600) for p in procs]
    assert rcs == [0] * 4, f'4-proc trainer worker rcs: {rcs}'
    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
    rc = subprocess.run([sys.executable, me, '0', '1', workdir],
                        env=env, timeout=600).returncode
    assert rc == 0
    with open(os.path.join(workdir, 'result_np4.json')) as f:
        multi = json.load(f)
    with open(os.path.join(workdir, 'result_np1.json')) as f:
        sref = json.load(f)
    np.testing.assert_allclose(multi['losses'], sref['losses'],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(multi['eval_oa'], sref['eval_oa'], atol=2e-5)
    assert multi['devices'] == 8 and multi['local_devices'] == 2

    print('HYBRID MULTIPROCESS VALIDATION OK')
    print('  4-proc hybrid zero-1 stitched:', [round(l, 6) for l in stitched])
    print('  1-proc reference            :',
          [round(l, 6) for l in single['losses']])
    print('  4-proc trainer losses == single; eval OA',
          multi['eval_oa'], '== ', sref['eval_oa'])
    print('  result dir:', workdir)


def tiled_worker(pid: int, nproc: int, workdir: str) -> None:
    """Whole-scene tiled inference ACROSS process boundaries (VERDICT r4 #8).

    4 processes × 2 fake devices (or one 8-device process as reference): one
    176² scene, 64² tiles at stride 32 → 25 tiles (uneven: 25 % 8 == 1, so
    the tile list pads and the pad tiles carry weight 0), tile list sharded
    over the process-spanning 'data' axis, per-device canvases psum'd.  Runs
    the full 5k-tiles/s north-star serving composition: plain forward, fused
    d4-TTA, int8 W8A8 PTQ, and int8×TTA — each multi-process result must
    match the single-process canvas."""
    ndev = 8 if nproc == 1 else 2
    os.environ['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={ndev}'
    os.environ['EVER_COMPILE_CACHE'] = '0'
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from ever_tpu.core import dist
    if nproc > 1:
        dist.init_dist_env(f'localhost:{PORT + 4}', nproc, pid)
        assert jax.device_count() == 8

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np
    from ever_tpu.magic.tiled import tiled_inference
    from ever_tpu.ops import make_ptq_predict_fn, ptq_quantize
    from ever_tpu.parallel.mesh import make_mesh

    class TinySeg(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.relu(nn.Conv(8, (3, 3))(x))
            h = nn.relu(nn.Conv(8, (3, 3))(h))
            return nn.Conv(CLASSES, (1, 1))(h)

    model = TinySeg()
    rng = np.random.default_rng(11)
    variables = model.init({'params': jax.random.key(3)},
                           jnp.ones((1, 64, 64, 3)))
    scene = jnp.asarray(rng.normal(size=(176, 176, 3)).astype(np.float32))

    def predict(tiles):
        return model.apply(variables, tiles, train=False)

    calib = [jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))]
    qv = ptq_quantize(model, variables, calib,
                      apply_kwargs=dict(train=False), min_in_features=1)
    predict_q = make_ptq_predict_fn(model, qv, train=False)

    mesh = make_mesh(('data',))
    out = {}
    for tag, fn, tta in (('plain', predict, None), ('tta', predict, 'd4'),
                         ('int8', predict_q, None),
                         ('int8_tta', predict_q, 'd4')):
        res = tiled_inference(fn, scene, 64, 32, CLASSES, tile_batch=2,
                              mesh=mesh, tta=tta)
        jax.block_until_ready(res)
        out[tag] = np.asarray(res.addressable_data(0))

    dist.synchronize()
    if dist.is_main_process():
        tag = 'np1' if nproc == 1 else f'np{nproc}'
        np.savez(os.path.join(workdir, f'tiled_{tag}.npz'), **out)
        print(f'[tiled p{pid}] wrote tiled_{tag}.npz '
              f'({ {k: v.shape for k, v in out.items()} })', flush=True)
    dist.synchronize()


def launch_tiled() -> None:
    workdir = tempfile.mkdtemp(prefix='mpval_tiled_')
    me = os.path.abspath(__file__)
    import numpy as np

    procs = [subprocess.Popen(
        [sys.executable, me, str(pid), '4', workdir, '--tiled'])
        for pid in range(4)]
    rcs = [p.wait(timeout=600) for p in procs]
    assert rcs == [0] * 4, f'tiled worker rcs: {rcs}'
    rc = subprocess.run([sys.executable, me, '0', '1', workdir, '--tiled'],
                        timeout=600).returncode
    assert rc == 0

    multi = np.load(os.path.join(workdir, 'tiled_np4.npz'))
    single = np.load(os.path.join(workdir, 'tiled_np1.npz'))
    for tag in ('plain', 'tta', 'int8', 'int8_tta'):
        np.testing.assert_allclose(multi[tag], single[tag],
                                   rtol=1e-4, atol=1e-5, err_msg=tag)
    print('TILED MULTIPROCESS VALIDATION OK')
    print('  4-proc x 2-dev whole-scene == 1-proc x 8-dev for',
          list(single.files), '(25 tiles, uneven over 8 devices)')
    print('  result dir:', workdir)


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
    if '--launch-hybrid' in sys.argv:
        launch_hybrid()
    elif '--launch-tiled' in sys.argv:
        launch_tiled()
    elif '--launch' in sys.argv:
        launch()
    elif '--tiled' in sys.argv:
        tiled_worker(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
    elif '--hybrid' in sys.argv:
        hybrid_worker(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                      sys.argv[sys.argv.index('--hybrid') + 1])
    else:
        worker(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
