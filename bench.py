"""Benchmark: FarSeg-R50 training throughput on the available chip(s).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}``.

Primary metric (BASELINE.json): 512² tiles/sec/chip for FarSeg-R50 training.
``vs_baseline`` is measured MFU / 0.45 (the north-star ≥45% MFU on v5e), with
FLOPs taken from XLA's own cost analysis of the compiled step.
"""

from __future__ import annotations

import json
import time

# v5e bf16 peak per chip (TFLOP/s)
PEAK_TFLOPS = {'v5 lite': 197.0, 'v5e': 197.0, 'v4': 275.0, 'v5p': 459.0,
               'v6e': 918.0, 'cpu': 0.5}


def _peak_for(device) -> float:
    kind = getattr(device, 'device_kind', 'cpu').lower()
    for k, v in PEAK_TFLOPS.items():
        if k in kind:
            return v * 1e12
    return 197.0 * 1e12


def _wait_for_backend(max_wait: float, probe_timeout: float = 240.0) -> str:
    """Probe ``jax.devices()`` in a SUBPROCESS until the backend answers.

    Returns '' once a probe succeeds, else the last probe error after
    ``max_wait`` seconds.

    The tunneled axon plugin hangs indefinitely in-process when the TPU
    tunnel is down (observed: 30+ min of failed probes), which would hang
    the whole benchmark run.  A subprocess probe is killable; retry within
    ``max_wait`` seconds (the tunnel does come back) and report failure
    instead of hanging.  A healthy tunnel answers in ~60-70 s (process
    startup), hence the generous per-probe timeout.
    """
    import os
    import subprocess
    import sys

    deadline = time.time() + max_wait
    last_err = ''
    while True:
        try:
            proc = subprocess.run(
                [sys.executable, '-c', 'import jax; jax.devices()'],
                timeout=probe_timeout, capture_output=True,
                env=dict(os.environ, EVER_COMPILE_CACHE='0'))
            if proc.returncode == 0:
                return ''
            last_err = proc.stderr.decode(errors='replace').strip()[-300:]
        except subprocess.TimeoutExpired:
            last_err = f'probe timed out after {probe_timeout:.0f}s'
        if time.time() >= deadline:
            return last_err or 'backend probe failed'
        time.sleep(30)


def main():
    # Bound backend acquisition BEFORE touching jax in this process
    # (EVER_BENCH_WAIT seconds, default 30 min; 0 skips the probe).
    import os
    max_wait = float(os.environ.get('EVER_BENCH_WAIT', '1800'))
    err = _wait_for_backend(max_wait) if max_wait > 0 else ''
    if err:
        print(json.dumps({
            'metric': 'farseg_r50_train_tiles_per_sec_per_chip',
            'value': 0.0, 'unit': 'tiles/sec/chip', 'vs_baseline': 0.0,
            'error': f'jax backend unreachable after {max_wait:.0f}s '
                     f'(TPU tunnel down?); no measurement taken: {err}',
        }))
        raise SystemExit(1)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ever_tpu.core import builder
    from ever_tpu.parallel.mesh import batch_sharding, host_to_global, make_mesh, replicated
    from ever_tpu.parallel.spmd import (build_train_loop, build_train_step,
                                        create_train_state)

    devices = jax.devices()
    n_chips = len(devices)
    on_tpu = 'cpu' not in devices[0].device_kind.lower()

    tile = 512 if on_tpu else 64
    batch = 8 * n_chips if on_tpu else n_chips
    steps = 20 if on_tpu else 3

    # stem='s2d_input': the exact space-to-depth fold of the 7x7/2 conv
    # (same parameters, same outputs, ~3x faster stem on the MXU), with the
    # 2x2 block layout produced by the HOST pipeline (preprocess.SpaceToDepth
    # during batch assembly — free there, 0.7 ms/step as a device transpose).
    # Inference keeps stem='s2d' (tiles are gathered on device from a scene).
    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet50',
                     stem='s2d_input' if on_tpu else 's2d',
                     # layer1 in the 128-lane pack2 layout (-0.8 ms/step
                     # measured; identical params, docs/PERFORMANCE.md)
                     pack2_layer1=bool(on_tpu)),
        classes=7,
        dtype='bfloat16' if on_tpu else 'float32',
    )})
    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9, max_iters=1000)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule)

    mesh = make_mesh(('data',), devices=devices) if n_chips > 1 else None

    rng = np.random.default_rng(0)
    # stage in bf16 on TPU: the model computes in bf16 and casts its input
    # anyway; production loaders feed bf16 (identical numerics, half traffic)
    in_dt = np.float32 if not on_tpu else jnp.bfloat16
    x = rng.normal(size=(batch, tile, tile, 3)).astype(in_dt)
    y = rng.integers(0, 7, size=(batch, tile, tile)).astype(np.int32)
    if on_tpu:
        # host-side 2x2 space-to-depth (preprocess.SpaceToDepth semantics)
        xs = np.asarray(x, np.float32).reshape(
            batch, tile // 2, 2, tile // 2, 2, 3)
        x = np.ascontiguousarray(xs.transpose(0, 1, 3, 2, 4, 5)).reshape(
            batch, tile // 2, tile // 2, 12).astype(in_dt)

    state = create_train_state(model, tx, (x, y), rng=jax.random.key(0))
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))
        sharding = batch_sharding(mesh)
        data = host_to_global((x, y), sharding)
    else:
        data = jax.device_put((jnp.asarray(x), jnp.asarray(y)))

    step = build_train_step(model, tx, schedule, forward_times=1, mesh=mesh,
                            donate=False)
    # K steps per dispatch (build_train_loop): amortizes host->device dispatch
    # latency, the standard TPU steps-per-loop pattern.  The K staged batches
    # here are copies of the same synthetic batch (timing is data-independent).
    K = 20 if on_tpu else 2
    loop = build_train_loop(model, tx, schedule, steps_per_loop=K, mesh=mesh,
                            donate=False)
    loop_data = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (K,) + a.shape),
                             data)

    # FLOPs of one step from XLA cost analysis.  MFU must count the TRUE
    # model FLOPs: the pack2 layout's zero-block packed weights inflate the
    # packed program's counted flops (2943 vs 2780 GFLOP measured), so the
    # denominator comes from an UNPACKED twin of the same model (identical
    # math), lowered but never compiled.
    # The axon TPU plugin HANGS on pre-compile cost_analysis, so the
    # reference count runs in a CPU subprocess (tools/ref_flops.py).
    step_flops = 0.0
    if on_tpu:
        import os
        import subprocess
        import sys
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(
                    os.path.abspath(__file__)), 'tools', 'ref_flops.py'),
                 '--batch', str(batch), '--tile', str(tile)],
                capture_output=True, text=True, timeout=600)
            step_flops = float(out.stdout.strip().splitlines()[-1])
        except Exception:
            step_flops = 0.0
    if not step_flops:
        try:
            # fallback: the running (possibly packed) program's own count —
            # NOTE this overcounts pack2's zero-block padding; step_flops_g
            # in the JSON line makes the denominator auditable
            cost = jax.jit(step).lower(state, data).compile().cost_analysis()
            step_flops = float(cost.get('flops', 0.0)) if cost else 0.0
        except Exception:
            step_flops = 0.0

    def sync(s):
        # NOTE: on the axon tunnel backend block_until_ready returns early;
        # a host fetch is the only reliable sync point
        return float(jax.device_get(jnp.sum(s.params['head']['fpn_decoder']
                                            ['classifier']['bias'])))

    # warmup (compile)
    state, _ = step(state, data)
    state, _ = loop(state, loop_data)
    sync(state)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = loop(state, loop_data)
    sync(state)
    dt = (time.perf_counter() - t0) / (steps * K)

    tiles_per_sec = batch / dt
    tiles_per_sec_chip = tiles_per_sec / n_chips
    peak = _peak_for(devices[0]) * n_chips
    mfu = (step_flops / dt) / peak if step_flops and peak else 0.0

    # secondary: whole-scene sliding-window inference (north star:
    # >= 5000 512² tiles/sec on v5e-8 = 625/chip).  With multiple chips the
    # tile list shards over the mesh (one psum per scene) and the metric
    # stays per-chip.
    infer_tiles_per_sec_chip = 0.0
    if on_tpu and n_chips > 1:
        from ever_tpu.magic.tiled import tiled_inference
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        infer_model = builder.make_model({'type': 'FarSeg', 'params': dict(
            encoder=dict(resnet_type='resnet50', stem='s2d',
                         pack2_layer1=True),
            classes=7, dtype='bfloat16')})

        def predict(tiles):
            return infer_model.apply(variables, tiles, train=False)

        scene = jnp.asarray(rng.normal(size=(4096, 4096, 3)).astype(np.float32)
                            ).astype(jnp.bfloat16)
        n_tiles = 64
        out = tiled_inference(predict, scene, 512, 512, 7, tile_batch=8,
                              mesh=mesh)
        _ = float(jax.device_get(jnp.sum(out[0, 0])))
        t0 = time.perf_counter()
        for _ in range(3):
            out = tiled_inference(predict, scene, 512, 512, 7, tile_batch=8,
                                  mesh=mesh)
        _ = float(jax.device_get(jnp.sum(out[0, 0])))
        infer_tiles_per_sec_chip = n_tiles / ((time.perf_counter() - t0) / 3) / n_chips
    if on_tpu and n_chips == 1:
        from ever_tpu.magic.tiled import tiled_inference
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        # same params, raw-layout stem for on-device tile gathering
        infer_model = builder.make_model({'type': 'FarSeg', 'params': dict(
            encoder=dict(resnet_type='resnet50', stem='s2d',
                         pack2_layer1=True),
            classes=7, dtype='bfloat16')})

        def predict(tiles):
            return infer_model.apply(variables, tiles, train=False)

        # bf16 scene staging (model computes bf16 anyway; halves gather
        # traffic) + tile_batch=8 measured best on v5e (tools/infer_grid.py:
        # 712 t/s vs 689-701 for f32 / larger batches)
        scene = jnp.asarray(rng.normal(size=(4096, 4096, 3)).astype(np.float32)
                            ).astype(jnp.bfloat16)
        n_tiles = 64
        out = tiled_inference(predict, scene, 512, 512, 7, tile_batch=8)
        _ = float(jax.device_get(jnp.sum(out[0, 0])))
        t0 = time.perf_counter()
        for _ in range(3):
            out = tiled_inference(predict, scene, 512, 512, 7, tile_batch=8)
        _ = float(jax.device_get(jnp.sum(out[0, 0])))
        infer_tiles_per_sec_chip = n_tiles / ((time.perf_counter() - t0) / 3)

        # D4-TTA whole-scene variant: 8 symmetries fused into the same scan
        # (one program; ~8x the FLOPs per tile).  tile_batch=2 keeps the
        # 8-way expanded predict batch at 16 tiles.
        out = tiled_inference(predict, scene, 512, 512, 7, tile_batch=2,
                              tta='d4')
        _ = float(jax.device_get(jnp.sum(out[0, 0])))
        t0 = time.perf_counter()
        for _ in range(2):
            out = tiled_inference(predict, scene, 512, 512, 7, tile_batch=2,
                                  tta='d4')
        _ = float(jax.device_get(jnp.sum(out[0, 0])))
        tta_tiles_per_sec_chip = n_tiles / ((time.perf_counter() - t0) / 2)

        # int8 W8A8 PTQ serving variant (ops/ptq.py): per-channel weight /
        # per-tensor activation scales from one calibration batch; measured
        # 873 t/s vs 710 bf16 with 99.96% argmax agreement
        # (tools/ptq_check.py, docs/PERFORMANCE.md "Int8 W8A8 PTQ").
        try:
            from ever_tpu.ops import make_ptq_predict_fn, ptq_quantize
            calib = [jnp.asarray(rng.normal(size=(8, 512, 512, 3))
                                 .astype(np.float32))]
            qv = ptq_quantize(infer_model, variables, calib,
                              apply_kwargs=dict(train=False),
                              min_in_features=64)
            predict_q = make_ptq_predict_fn(infer_model, qv, train=False)
            out = tiled_inference(predict_q, scene, 512, 512, 7, tile_batch=8)
            _ = float(jax.device_get(jnp.sum(out[0, 0])))
            t0 = time.perf_counter()
            for _ in range(3):
                out = tiled_inference(predict_q, scene, 512, 512, 7,
                                      tile_batch=8)
            _ = float(jax.device_get(jnp.sum(out[0, 0])))
            int8_tiles_per_sec_chip = n_tiles / ((time.perf_counter() - t0) / 3)
        except Exception:
            int8_tiles_per_sec_chip = 0.0
    else:
        tta_tiles_per_sec_chip = 0.0
        int8_tiles_per_sec_chip = 0.0

    print(json.dumps({
        'metric': 'farseg_r50_train_tiles_per_sec_per_chip',
        'value': round(tiles_per_sec_chip, 2),
        'unit': f'{tile}x{tile} tiles/sec/chip',
        'vs_baseline': round(mfu / 0.45, 4) if mfu else 0.0,
        'mfu': round(mfu, 4),
        'step_time_ms': round(dt * 1000, 2),
        'step_flops_g': round(step_flops / 1e9, 1),
        'infer_tiles_per_sec_per_chip': round(infer_tiles_per_sec_chip, 1),
        'infer_vs_baseline': round(infer_tiles_per_sec_chip / 625.0, 4),
        'tta_d4_tiles_per_sec_per_chip': round(tta_tiles_per_sec_chip, 1),
        'int8_infer_tiles_per_sec_per_chip': round(int8_tiles_per_sec_chip, 1),
        'n_chips': n_chips,
        'global_batch': batch,
        'device': devices[0].device_kind,
    }))


if __name__ == '__main__':
    main()
