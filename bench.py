"""Benchmark: ever_tpu training/inference throughput on the available chip(s).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}``.

Timeout-proof (VERDICT r4 #1): on TPU the cumulative line is re-printed
after every section, so the LAST stdout line is always the most complete
measurement even if the process is killed mid-run; a global wall budget
(``EVER_BENCH_BUDGET`` seconds, default 3300) skips remaining sections
rather than overrun, annotating them in a ``skipped`` field.

Primary metric (BASELINE.json): 512² tiles/sec/chip for FarSeg-R50 training.
``vs_baseline`` is measured MFU / 0.45 (the north-star ≥45% MFU on v5e), with
FLOPs taken from XLA's own cost analysis of the compiled step.

Secondary metrics on the same line: whole-scene tiled inference (bf16 / fused
D4-TTA / int8 PTQ) and the DINOv3 ViT-L/16 fine-tune train step at 512² and
dense 1024² (the flash-attention regime) — the transformer half of the zoo.

Every timed number is the MEDIAN of >=3 timing windows; the ``noise`` field
records each metric's (max-min)/median spread so round-over-round deltas can
be told apart from tunnel jitter (the wall clock here swings ±1 ms with
occasional 15% outliers).

``--config {factseg,changestar,changemask,changeos,gan}`` instead times one
of the other BASELINE workloads' train step at production sizes and prints
its own JSON line (used for the PERFORMANCE.md step table, not by the
driver).
"""

from __future__ import annotations

import argparse
import json
import statistics
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


def _wait_for_backend(max_wait: float, probe_timeout: float = 240.0):
    """Probe ``jax.devices()`` in a SUBPROCESS until the backend answers.

    Returns ``('', device_kind)`` once a probe succeeds, else
    ``(last_error, '')`` after ``max_wait`` seconds.

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
                [sys.executable, '-c',
                 'import jax; print(jax.devices()[0].device_kind)'],
                timeout=probe_timeout, capture_output=True, text=True,
                env=dict(os.environ, EVER_COMPILE_CACHE='0'))
            if proc.returncode == 0:
                return '', proc.stdout.strip().splitlines()[-1]
            last_err = proc.stderr.strip()[-300:]
        except subprocess.TimeoutExpired:
            last_err = f'probe timed out after {probe_timeout:.0f}s'
        if time.time() >= deadline:
            return (last_err or 'backend probe failed'), ''
        time.sleep(30)


def _ref_flops(extra_args) -> float:
    """TRUE step FLOPs from an unpacked/XLA-attention twin of the model,
    lowered (never compiled) on a CPU subprocess — the axon TPU plugin hangs
    on pre-compile cost_analysis, and packed/padded layouts (pack2 conv
    weights, flash-attention token padding) inflate the running program's
    own count above the honest MFU denominator."""
    import os
    import subprocess
    import sys
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), 'tools', 'ref_flops.py')]
            + [str(a) for a in extra_args],
            capture_output=True, text=True, timeout=900)
        return float(out.stdout.strip().splitlines()[-1])
    except Exception:
        return 0.0


def _median_windows(run_window, sync, windows: int = 3):
    """Time ``run_window`` (a closure issuing a fixed amount of device work)
    ``windows`` times with a host-fetch sync after each; return
    (per-window seconds list, median, (max-min)/median spread)."""
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        run_window()
        sync()
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med if med else 0.0
    return times, med, spread


def _bench_farseg(jax, jnp, np, on_tpu, devices, n_chips, mesh_mod, spmd,
                  include_infer=True):
    from ever_tpu.core import builder
    (batch_sharding, host_to_global, make_mesh, replicated) = mesh_mod
    (build_train_loop, build_train_step, create_train_state) = spmd

    tile = 512 if on_tpu else 64
    batch = 8 * n_chips if on_tpu else n_chips
    windows = 3

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
    loops_per_window = 6 if on_tpu else 1
    loop = build_train_loop(model, tx, schedule, steps_per_loop=K, mesh=mesh,
                            donate=False)
    loop_data = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (K,) + a.shape),
                             data)

    # FLOPs of one step from XLA cost analysis of the UNPACKED twin (the
    # pack2 layout's zero-block packed weights inflate the packed program's
    # counted flops: 2943 vs 2780 GFLOP measured).
    step_flops = _ref_flops(['--batch', batch, '--tile', tile]) if on_tpu else 0.0
    if not step_flops:
        try:
            # fallback: the running (possibly packed) program's own count —
            # NOTE this overcounts pack2's zero-block padding; step_flops_g
            # in the JSON line makes the denominator auditable
            cost = jax.jit(step).lower(state, data).compile().cost_analysis()
            step_flops = float(cost.get('flops', 0.0)) if cost else 0.0
        except Exception:
            step_flops = 0.0

    state_box = [state]

    def sync():
        # NOTE: on the axon tunnel backend block_until_ready returns early;
        # a host fetch is the only reliable sync point
        s = state_box[0]
        return float(jax.device_get(jnp.sum(s.params['head']['fpn_decoder']
                                            ['classifier']['bias'])))

    # warmup (compile)
    state_box[0], _ = step(state_box[0], data)
    state_box[0], _ = loop(state_box[0], loop_data)
    sync()

    def window():
        for _ in range(loops_per_window):
            state_box[0], _ = loop(state_box[0], loop_data)

    _, med, spread = _median_windows(window, sync)
    dt = med / (loops_per_window * K)

    tiles_per_sec_chip = batch / dt / n_chips
    peak = _peak_for(devices[0]) * n_chips
    mfu = (step_flops / dt) / peak if step_flops and peak else 0.0

    out = {
        'value': round(tiles_per_sec_chip, 2),
        'vs_baseline': round(mfu / 0.45, 4) if mfu else 0.0,
        'mfu': round(mfu, 4),
        'step_time_ms': round(dt * 1000, 2),
        'step_flops_g': round(step_flops / 1e9, 1),
        'global_batch': batch,
        'noise': {'train_spread': round(spread, 4)},
    }

    # secondary: whole-scene sliding-window inference (north star:
    # >= 5000 512² tiles/sec on v5e-8 = 625/chip).  With multiple chips the
    # tile list shards over the mesh (one psum per scene) and the metric
    # stays per-chip.  On TPU the orchestrated run times inference in its
    # OWN fresh process instead (see _bench_infer / main) — chip state left
    # behind by the train sections measurably depresses it.
    if not on_tpu and include_infer:
        out.update(infer_tiles_per_sec_per_chip=0.0,
                   tta_d4_tiles_per_sec_per_chip=0.0,
                   int8_infer_tiles_per_sec_per_chip=0.0,
                   int8_tta_d4_tiles_per_sec_per_chip=0.0,
                   infer_vs_baseline=0.0)
        return out
    if include_infer:
        state = state_box[0]
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        infer = _bench_infer(jax, jnp, np, devices, n_chips, mesh,
                             variables=variables)
        out['noise'].update(infer.pop('noise'))
        out.update(infer)
    return out


def _bench_infer(jax, jnp, np, devices, n_chips, mesh, variables=None,
                 windows: int = 3):
    """Whole-scene tiled inference: bf16, fused D4-TTA, int8 PTQ, int8+TTA.

    ``variables=None`` initializes fresh weights (throughput is
    data-independent); a trained state may be passed when running inside
    the farseg section."""
    from ever_tpu.core import builder
    from ever_tpu.magic.tiled import tiled_inference

    rng = np.random.default_rng(0)
    # raw-layout stem for on-device tile gathering; pack2 OFF for inference
    # (r4 grid: 669.5 vs 665.4 t/s — the layer1 pack costs ~1% in the
    # serving composition while winning in training; docs/PERFORMANCE.md
    # "inference slide")
    infer_model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet50', stem='s2d'),
        classes=7, dtype='bfloat16')})
    if variables is None:
        x0 = jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
        variables = infer_model.init({'params': jax.random.key(0)}, x0)

    def predict(tiles):
        return infer_model.apply(variables, tiles, train=False)

    # bf16 scene staging (model computes bf16 anyway; halves gather
    # traffic) + tile_batch=8 measured best on v5e (tools/infer_grid.py:
    # 712 t/s vs 689-701 for f32 / larger batches)
    scene = jnp.asarray(rng.normal(size=(4096, 4096, 3)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    n_tiles = 64
    out_box = [None]
    out = {'noise': {}}

    def isync():
        return float(jax.device_get(jnp.sum(out_box[0][0, 0])))

    def run_infer(pred_fn, tb, tta=None):
        out_box[0] = tiled_inference(pred_fn, scene, 512, 512, 7,
                                     tile_batch=tb, tta=tta, mesh=mesh)

    def time_infer(pred_fn, tb, tta=None, reps=2):
        run_infer(pred_fn, tb, tta)  # warmup/compile
        isync()
        _, med, spr = _median_windows(
            lambda: [run_infer(pred_fn, tb, tta) for _ in range(reps)],
            isync, windows)
        return n_tiles * reps / med / n_chips, spr

    infer_tps, infer_spr = time_infer(predict, 8)
    out['noise']['infer_spread'] = round(infer_spr, 4)

    tta_tps = int8_tps = int8_tta_tps = 0.0
    if n_chips == 1:
        # D4-TTA whole-scene variant: 8 symmetries fused into the same scan
        # (one program; ~8x the FLOPs per tile).  tile_batch=2 keeps the
        # 8-way expanded predict batch at 16 tiles.
        tta_tps, tta_spr = time_infer(predict, 2, tta='d4', reps=1)
        out['noise']['tta_spread'] = round(tta_spr, 4)

        # int8 W8A8 PTQ serving variant (ops/ptq.py): per-channel weight /
        # per-tensor activation scales from one calibration batch
        # (tools/ptq_check.py, docs/PERFORMANCE.md "Int8 W8A8 PTQ").
        try:
            from ever_tpu.ops import make_ptq_predict_fn, ptq_quantize
            calib = [jnp.asarray(rng.normal(size=(8, 512, 512, 3))
                                 .astype(np.float32))]
            qv = ptq_quantize(infer_model, variables, calib,
                              apply_kwargs=dict(train=False),
                              min_in_features=64)
            predict_q = make_ptq_predict_fn(infer_model, qv, train=False)
            int8_tps, int8_spr = time_infer(predict_q, 8)
            out['noise']['int8_spread'] = round(int8_spr, 4)
            try:
                # deployment-grade composition: int8 convs INSIDE the fused
                # D4-TTA scan (8 symmetries per tile, quantized forward).
                # Separate except: a TTA-only failure must not zero the
                # already-measured plain int8 metric.
                int8_tta_tps, int8_tta_spr = time_infer(predict_q, 2,
                                                        tta='d4', reps=1)
                out['noise']['int8_tta_spread'] = round(int8_tta_spr, 4)
            except Exception:
                int8_tta_tps = 0.0
        except Exception:
            int8_tps = int8_tta_tps = 0.0

    out.update(
        infer_tiles_per_sec_per_chip=round(infer_tps, 1),
        infer_vs_baseline=round(infer_tps / 625.0, 4),
        tta_d4_tiles_per_sec_per_chip=round(tta_tps, 1),
        int8_infer_tiles_per_sec_per_chip=round(int8_tps, 1),
        int8_tta_d4_tiles_per_sec_per_chip=round(int8_tta_tps, 1),
    )
    return out


def _bench_vit(jax, jnp, np, on_tpu, devices, n_chips, tile: int, batch: int,
               remat=None, windows: int = 3):
    """DINOv3 ViT-L/16 sat493m fine-tune train step (DinoSeg: trunk + light
    decoder).  512² = the standard crop regime (N=1029); 1024² = the dense
    big-tile regime (N=4101).  Both auto-dispatch to the fused VMEM Pallas
    kernel (512 <= N <= 16384, ops/attention.py r4 sweep)."""
    from ever_tpu.core import builder
    from ever_tpu.parallel.spmd import (build_train_loop, create_train_state)

    model = builder.make_model({'type': 'DinoSeg', 'params': dict(
        backbone=dict(name='vitl16_sat493m', remat=remat),
        classes=7,
        dtype='bfloat16' if on_tpu else 'float32',
    )})
    schedule = builder.make_learningrate(
        {'type': 'cosine', 'params': dict(base_lr=1e-4, max_iters=1000)})
    factory, _ = builder.make_optimizer(
        {'type': 'adamw', 'params': dict(weight_decay=0.05)})
    tx = factory.build(schedule)

    rng = np.random.default_rng(0)
    in_dt = np.float32 if not on_tpu else jnp.bfloat16
    x = rng.normal(size=(batch, tile, tile, 3)).astype(in_dt)
    y = rng.integers(0, 7, size=(batch, tile, tile)).astype(np.int32)

    state = create_train_state(model, tx, (x, y), rng=jax.random.key(0))
    data = jax.device_put((jnp.asarray(x), jnp.asarray(y)))

    K = (10 if tile <= 512 else 4) if on_tpu else 2
    loops_per_window = 2 if on_tpu else 1
    # donate=True is LOAD-BEARING here: ViT-L's fp32 adamw state is 3.6 GB,
    # and without input/output aliasing the back-to-back loop calls in a
    # timing window transiently hold up to three copies (the tunnel frees
    # buffers lazily) — RESOURCE_EXHAUSTED observed mid-window on v5e-16GB
    # while the warmup call succeeded.  Donation caps it at one state plus
    # activations; numerics and step time are identical.
    loop = build_train_loop(model, tx, schedule, steps_per_loop=K, mesh=None,
                            donate=True)
    loop_data = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (K,) + a.shape),
                             data)

    # honest FLOPs: XLA-attention, no-remat twin on CPU (the Pallas kernels
    # pad token counts to block multiples — real work, but not useful work;
    # remat recompute likewise must not count toward MFU)
    step_flops = _ref_flops(['--model', 'vit', '--batch', batch,
                             '--tile', tile]) if on_tpu else 0.0

    state_box = [state]

    def sync():
        s = state_box[0]
        return float(jax.device_get(jnp.sum(
            s.params['head_classifier']['bias'])))

    state_box[0], _ = loop(state_box[0], loop_data)
    sync()

    def window():
        for _ in range(loops_per_window):
            state_box[0], _ = loop(state_box[0], loop_data)

    _, med, spread = _median_windows(window, sync, windows)
    dt = med / (loops_per_window * K)

    peak = _peak_for(devices[0]) * n_chips
    mfu = (step_flops / dt) / peak if step_flops and peak else 0.0
    return {
        'tiles_per_sec_per_chip': round(batch / dt / n_chips, 2),
        'mfu': round(mfu, 4),
        'step_time_ms': round(dt * 1000, 2),
        'step_flops_g': round(step_flops / 1e9, 1),
        'batch': batch,
        'spread': round(spread, 4),
    }


def _bench_vit_infer(jax, jnp, np, on_tpu, devices, n_chips,
                     windows: int = 3):
    """DinoSeg (ViT-L/16 sat493m) whole-scene serving: bf16 and int8 W8A8
    PTQ throughput (VERDICT r3 #5's bench metric).  Mirrors the FarSeg
    infer section: one 4096² scene, 512² tiles, on-device paste.  PTQ
    quantizes the qkv/proj/MLP Dense layers (``ops/ptq.py`` — Dense covers
    ViT serving); the ACCURACY gate (int8 vs bf16 mIoU on a trained model)
    lives in ``tools/e2e_loveda.py --config dinoseg_vitl_loveda --ptq``,
    this section measures throughput only."""
    import os

    from ever_tpu.core import builder
    from ever_tpu.magic.tiled import tiled_inference

    rng = np.random.default_rng(0)
    model = builder.make_model({'type': 'DinoSeg', 'params': dict(
        backbone=dict(name='vitl16_sat493m' if on_tpu else 'vit_small',
                      attn_impl=None if on_tpu else 'xla'),
        classes=7, dtype='bfloat16' if on_tpu else 'float32')})
    x0 = jnp.zeros((1, 512, 512, 3),
                   jnp.bfloat16 if on_tpu else jnp.float32)
    variables = model.init({'params': jax.random.key(0)}, x0)

    # params as an ARGUMENT (variables=), never a closure: closure params
    # embed as compile-request constants and the tunnel's remote_compile
    # breaks its pipe serializing ViT-L's 600 MB (r5; magic/tiled.py doc)
    def predict(v, tiles):
        return model.apply(v, tiles, train=False)

    side = 4096 if on_tpu else 1024
    scene = jnp.asarray(rng.normal(size=(side, side, 3)).astype(np.float32))
    if on_tpu:
        scene = scene.astype(jnp.bfloat16)
    n_tiles = (side // 512) ** 2
    out_box = [None]
    out = {'noise': {}}

    def isync():
        return float(jax.device_get(jnp.sum(out_box[0][0, 0])))

    def time_infer(fn, v):
        def run():
            out_box[0] = tiled_inference(fn, scene, 512, 512, 7,
                                         tile_batch=8, variables=v)
        run()            # warmup/compile
        isync()
        _, med, spr = _median_windows(run, isync, windows)
        return n_tiles / med / n_chips, spr

    bf16_tps, bf16_spr = time_infer(predict, variables)
    out['noise']['vit_infer_spread'] = round(bf16_spr, 4)
    # print the bf16 fragment NOW: the int8 leg below reliably dies in a
    # ~15-35 min remote_compile "Broken pipe" (PERFORMANCE.md
    # 'remote-compile constants'), and if the orchestrator's budget kills
    # this section first, the partial-stdout salvage must still find the
    # measured number
    print(json.dumps(dict(out, tiles_per_sec_per_chip=round(bf16_tps, 1),
                          int8_tiles_per_sec_per_chip=0.0,
                          device=devices[0].device_kind, n_chips=n_chips)),
          flush=True)

    int8_tps = 0.0
    if os.environ.get('EVER_BENCH_VIT_INT8', '1') != '1':
        out.update(tiles_per_sec_per_chip=round(bf16_tps, 1),
                   int8_tiles_per_sec_per_chip=0.0,
                   int8_skipped='EVER_BENCH_VIT_INT8=0')
        return out
    try:
        from ever_tpu.ops import make_ptq_predict_fn, ptq_quantize
        calib = [jnp.asarray(rng.normal(size=(8, 512, 512, 3))
                             .astype(np.float32))]
        qv = ptq_quantize(model, variables, calib,
                          apply_kwargs=dict(train=False), min_in_features=64)
        from ever_tpu.ops.ptq import ptq_apply

        def predict_q(v, tiles):
            return ptq_apply(model, v, tiles, train=False)

        int8_tps, int8_spr = time_infer(predict_q, qv)
        out['noise']['vit_int8_spread'] = round(int8_spr, 4)
    except Exception as e:
        int8_tps = 0.0
        out['int8_error'] = f'{type(e).__name__}: {e}'[:300]

    out.update(
        tiles_per_sec_per_chip=round(bf16_tps, 1),
        int8_tiles_per_sec_per_chip=round(int8_tps, 1),
    )
    return out


def config_model_and_data(name: str, tile: int, batch: int, on_tpu: bool,
                          overrides=None):
    """(model_cfg, data) for one non-flagship BASELINE config at the given
    geometry — shared by ``--config`` timing and ``tools/profile_config.py``.
    ``overrides`` is a dict merged into the model params (dotted keys)."""
    import numpy as np

    common = dict(
        encoder=dict(resnet_type='resnet50'),
        fpn=dict(in_channels_list=(256, 512, 1024, 2048), out_channels=256),
        decoder=dict(in_channels=256, out_channels=256,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
        dtype='bfloat16' if on_tpu else 'float32',
    )
    rng = np.random.default_rng(0)
    x3 = rng.normal(size=(batch, tile, tile, 3)).astype(np.float32)
    x6 = rng.normal(size=(batch, tile, tile, 6)).astype(np.float32)
    yseg = rng.integers(0, 7, size=(batch, tile, tile)).astype(np.int32)
    ybin = rng.integers(0, 2, size=(batch, tile, tile)).astype(np.int32)

    if name == 'factseg':
        model_cfg = {'type': 'FactSeg', 'params': dict(common, classes=7)}
        data = (x3, yseg)
    elif name == 'changestar':
        model_cfg = {'type': 'ChangeStar', 'params': dict(
            common, changemixin=dict(in_channels=512, inner_channels=16,
                                     num_convs=4, scale_factor=4.0),
            classes=1)}
        data = (x6, dict(masks=ybin, change=ybin))
    elif name == 'changemask':
        model_cfg = {'type': 'ChangeMask', 'params': dict(common, classes=2)}
        data = (x6, dict(masks=np.stack([ybin, ybin], axis=-1), change=ybin))
    elif name == 'changeos':
        model_cfg = {'type': 'ChangeOS', 'params': dict(
            common, damage_classes=5)}
        dam = rng.integers(0, 5, size=(batch, tile, tile)).astype(np.int32)
        data = (x6, dict(loc=ybin, damage=np.where(ybin == 0, 0, dam)))
    else:
        raise SystemExit(f'unknown --config {name!r}')
    if overrides:
        import ast
        for key, v in overrides.items():
            node = model_cfg['params']
            parts = key.split('.')
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            try:
                node[parts[-1]] = ast.literal_eval(v) if isinstance(v, str) else v
            except (ValueError, SyntaxError):
                node[parts[-1]] = v
    return model_cfg, data


def _bench_config(name: str):
    """Time one of the non-flagship BASELINE train steps at production sizes
    (512², batch 8, bf16, R50 trunks) on the chip.  Prints one JSON line."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ever_tpu.core import builder
    from ever_tpu.parallel.spmd import build_train_loop, create_train_state

    devices = jax.devices()
    on_tpu = 'cpu' not in devices[0].device_kind.lower()
    tile = 512 if on_tpu else 32
    batch = 8 if on_tpu else 2

    if name == 'gan':
        return _bench_gan(tile, batch, on_tpu)
    model_cfg, data = config_model_and_data(name, tile, batch, on_tpu)
    model = builder.make_model(model_cfg)
    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9, max_iters=1000)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule)

    state = create_train_state(model, tx, data, rng=jax.random.key(0))
    dev_data = jax.device_put(jax.tree.map(jnp.asarray, data))
    K = 10 if on_tpu else 2
    loop = build_train_loop(model, tx, schedule, steps_per_loop=K, donate=False)
    loop_data = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (K,) + a.shape),
                             dev_data)

    step_flops = _ref_flops(['--model', name, '--batch', batch,
                             '--tile', tile]) if on_tpu else 0.0

    box = [state]

    def sync():
        leaf = jax.tree.leaves(box[0].params)[0]
        return float(jax.device_get(jnp.sum(leaf)))

    t_compile0 = time.perf_counter()
    box[0], _ = loop(box[0], loop_data)
    sync()
    compile_s = time.perf_counter() - t_compile0

    def window():
        for _ in range(2 if on_tpu else 1):
            box[0], _ = loop(box[0], loop_data)

    _, med, spread = _median_windows(window, sync)
    dt = med / ((2 if on_tpu else 1) * K)
    peak = _peak_for(devices[0])
    mfu = (step_flops / dt) / peak if step_flops and peak else 0.0

    print(json.dumps({
        'metric': f'{name}_train_tiles_per_sec_per_chip',
        'value': round(batch / dt, 2),
        'unit': f'{tile}x{tile} tiles/sec/chip',
        'vs_baseline': round(mfu / 0.45, 4) if mfu else 0.0,
        'mfu': round(mfu, 4),
        'step_time_ms': round(dt * 1000, 2),
        'step_flops_g': round(step_flops / 1e9, 1),
        'compile_plus_first_window_s': round(compile_s, 1),
        'spread': round(spread, 4),
        'global_batch': batch,
        'device': devices[0].device_kind,
    }))
    return None


def _bench_gan(tile: int, batch: int, on_tpu: bool):
    """Time the jitted D-then-G dual-optimizer GAN step (trainer/gan.py) —
    the one program family that had never touched the chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ever_tpu.core import builder
    from ever_tpu.trainer.gan import build_gan_train_step, create_gan_state

    size = 128 if on_tpu else 32
    batch = 32 if on_tpu else 4
    model = builder.make_model({'type': 'DCGAN', 'params': dict(
        image_size=size, channels=3, latent_dim=128, base_width=64,
        dtype='bfloat16' if on_tpu else 'float32')})
    txs = {role: builder.make_optimizer(
        {'type': 'adam', 'params': dict(betas=(0.5, 0.999))})[0]
        .build(lambda s: 2e-4) for role in ('G', 'D')}

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, size, size, 3)).astype(np.float32))
    state = create_gan_state(model, txs, x, rng=jax.random.key(0))
    step = build_gan_train_step(model, txs, donate=False)

    box = [state]

    def sync():
        leaf = jax.tree.leaves(box[0].params['G'])[0]
        return float(jax.device_get(jnp.sum(leaf)))

    t0 = time.perf_counter()
    box[0], m = step(box[0], x)
    sync()
    compile_s = time.perf_counter() - t0

    def window():
        for _ in range(20 if on_tpu else 2):
            box[0], _ = step(box[0], x)

    _, med, spread = _median_windows(window, sync)
    dt = med / (20 if on_tpu else 2)
    print(json.dumps({
        'metric': 'gan_train_steps_per_sec',
        'value': round(1.0 / dt, 2),
        'unit': f'D+G steps/sec ({size}x{size} batch {batch})',
        'vs_baseline': 0.0,
        'step_time_ms': round(dt * 1000, 2),
        'compile_plus_first_step_s': round(compile_s, 1),
        'spread': round(spread, 4),
        'device': jax.devices()[0].device_kind,
    }))
    return None


# generous per-section subprocess timeouts (cold Mosaic compile of the ViT
# 512² step took 42 min once — the persistent cache usually absorbs it).
# The GLOBAL wall budget (EVER_BENCH_BUDGET) caps these further at runtime.
_SECTION_TIMEOUT = {'infer': 2400, 'farseg': 2400, 'vit512': 3600,
                    'vit1024': 3600, 'vitinfer': 2400}

# minimum remaining budget worth starting a section with: tunnel process
# startup is ~60-70 s and a warm-cache section takes ~60-120 s more
_SECTION_MIN_S = 180.0


def _run_section_subprocess(name: str, extra=(), timeout=None):
    """Run one bench section in a FRESH process (its own TPU tunnel client)
    and parse its JSON line.  Fresh-process isolation is load-bearing for
    the inference metric: chip/client state left behind by the train
    sections (lazily-freed buffers, allocator fragmentation) measurably
    depressed it when everything shared one process (the r01→r03
    722.6→655.4 tiles/s slide — docs/PERFORMANCE.md 'inference slide')."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, EVER_BENCH_WAIT='0')  # parent already probed
    cmd = [sys.executable, os.path.abspath(__file__), '--section', name,
           *extra]
    if timeout is None:
        timeout = _SECTION_TIMEOUT.get(name, 2400)
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                              timeout=timeout)
    except subprocess.TimeoutExpired as e:
        # a section may have printed a partial fragment before the kill
        # (vitinfer prints its bf16 numbers before attempting int8) —
        # salvage it rather than discarding the whole section
        partial = e.stdout or b''
        if isinstance(partial, bytes):
            partial = partial.decode('utf-8', 'replace')
        for line in reversed(partial.strip().splitlines()):
            try:
                out = json.loads(line)
                out['truncated'] = f'section killed at {timeout:.0f}s'
                return out
            except (json.JSONDecodeError, ValueError):
                continue
        return {'error': f'section {name} timed out after {timeout:.0f}s'}
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    return {'error': f'section {name} rc={proc.returncode}: '
                     + proc.stderr.strip()[-300:]}


def _section_main(name: str, args):
    """Run one section in-process and print its JSON fragment."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ever_tpu.parallel.mesh import (batch_sharding, host_to_global,
                                        make_mesh, replicated)
    from ever_tpu.parallel.spmd import (build_train_loop, build_train_step,
                                        create_train_state)

    devices = jax.devices()
    n_chips = len(devices)
    on_tpu = 'cpu' not in devices[0].device_kind.lower()

    if name == 'infer':
        if args.prelude_vit:
            # A/B instrument for the inference-slide diagnosis: reproduce
            # the r03 in-process ordering (ViT train → inference) so the
            # chip-state confound is measurable against a fresh process.
            _bench_vit(jax, jnp, np, on_tpu, devices, n_chips,
                       tile=512, batch=8)
            import gc
            jax.clear_caches()
            gc.collect()
        mesh = make_mesh(('data',), devices=devices) if n_chips > 1 else None
        out = _bench_infer(jax, jnp, np, devices, n_chips, mesh,
                           windows=args.windows)
    elif name == 'farseg':
        out = _bench_farseg(
            jax, jnp, np, on_tpu, devices, n_chips,
            (batch_sharding, host_to_global, make_mesh, replicated),
            (build_train_loop, build_train_step, create_train_state),
            include_infer=False)
    elif name == 'vit512':
        out = _bench_vit(jax, jnp, np, on_tpu, devices, n_chips,
                         tile=512, batch=8)
    elif name == 'vit1024':
        out = _bench_vit(jax, jnp, np, on_tpu, devices, n_chips,
                         tile=1024, batch=2, remat=args.vit_remat)
    elif name == 'vitinfer':
        out = _bench_vit_infer(jax, jnp, np, on_tpu, devices, n_chips,
                               windows=args.windows)
    else:
        raise SystemExit(f'unknown --section {name!r}')
    out['device'] = devices[0].device_kind
    out['n_chips'] = n_chips
    print(json.dumps(out))


def _assemble_line(results: dict, skipped: dict, elapsed_s: float):
    """Full JSON line from whatever sections have completed so far.

    Sections not yet run simply report zeros / are absent; ``skipped``
    records per-section reasons (budget exhaustion, timeout, crash) so a
    partial line is self-describing."""
    far = results.get('farseg', {})
    infer = results.get('infer', {})
    noise = dict(far.get('noise', {}))
    noise.update(infer.get('noise', {}))
    line = {
        'metric': 'farseg_r50_train_tiles_per_sec_per_chip',
        'value': far.get('value', 0.0),
        'unit': '512x512 tiles/sec/chip',
        'vs_baseline': far.get('vs_baseline', 0.0),
        'mfu': far.get('mfu', 0.0),
        'step_time_ms': far.get('step_time_ms', 0.0),
        'step_flops_g': far.get('step_flops_g', 0.0),
        'infer_tiles_per_sec_per_chip':
            infer.get('infer_tiles_per_sec_per_chip', 0.0),
        'infer_vs_baseline': infer.get('infer_vs_baseline', 0.0),
        'tta_d4_tiles_per_sec_per_chip':
            infer.get('tta_d4_tiles_per_sec_per_chip', 0.0),
        'int8_infer_tiles_per_sec_per_chip':
            infer.get('int8_infer_tiles_per_sec_per_chip', 0.0),
        'int8_tta_d4_tiles_per_sec_per_chip':
            infer.get('int8_tta_d4_tiles_per_sec_per_chip', 0.0),
        'n_chips': far.get('n_chips', 1),
        'global_batch': far.get('global_batch', 0),
        'device': far.get('device', infer.get('device', '?')),
        'noise': noise,
        'isolation': 'one process per section',
        'elapsed_s': round(elapsed_s, 1),
    }
    for key, src in (('error_farseg', far), ('error_infer', infer)):
        if 'error' in src:
            line[key] = src['error']
    for name, out_key in (('vit512', 'vit_train'), ('vit1024', 'vit1024_train'),
                          ('vitinfer', 'vit_infer')):
        if name in results:
            line[out_key] = results[name]
    if skipped:
        line['skipped'] = skipped
    return line


def _orchestrate(args, t_start: float):
    """Full benchmark line: each section in its own fresh process.

    Timeout-proof by construction (VERDICT r4 #1): the CUMULATIVE line is
    printed (and flushed) after EVERY section, so if the driver kills this
    process mid-run the tail is still the most complete measurement — a
    late-section timeout can no longer discard the already-measured FarSeg
    primary metric.  A global wall budget (``EVER_BENCH_BUDGET`` seconds,
    default 3300 — under the driver's observed kill window) skips
    remaining sections when low and caps each section's subprocess timeout
    by the remaining budget."""
    import os
    import sys

    budget = float(os.environ.get('EVER_BENCH_BUDGET', '3300'))
    deadline = t_start + budget

    sections = [('farseg', ()), ('infer', ())]
    if not args.skip_vit:
        sections += [('vit512', ()),
                     ('vit1024', ('--vit-remat', args.vit_remat)
                      if args.vit_remat else ()),
                     ('vitinfer', ())]

    results, skipped = {}, {}
    # an immediate placeholder line: even a kill during the FIRST section
    # leaves a parseable (all-zero, error-annotated) tail
    print(json.dumps(_assemble_line(
        results, {n: 'pending' for n, _ in sections},
        time.time() - t_start)), flush=True)

    cooldown = 0.0
    for name, extra in sections:
        remaining = deadline - time.time()
        if remaining < _SECTION_MIN_S:
            skipped[name] = f'budget exhausted ({remaining:.0f}s left)'
            continue
        if cooldown:
            # a killed TPU client can wedge the chip for minutes
            # (CLAUDE.md); give the next fresh process a chance — but never
            # spend budget the remaining sections need more
            time.sleep(min(cooldown, max(0.0, remaining - 900.0)))
            cooldown = 0.0
            remaining = deadline - time.time()
        timeout = min(_SECTION_TIMEOUT.get(name, 2400), remaining - 30.0)
        out = _run_section_subprocess(name, extra, timeout=timeout)
        if ('error' in out and 'timed out' not in out['error']
                and deadline - time.time() > _SECTION_MIN_S + 120.0):
            # transient tunnel faults (observed: remote_compile "Broken
            # pipe") kill a section mid-compile; one fresh-process retry
            # after a short breather usually succeeds
            time.sleep(120.0)
            retry = _run_section_subprocess(
                name, extra, timeout=min(_SECTION_TIMEOUT.get(name, 2400),
                                         deadline - time.time() - 30.0))
            if 'error' not in retry:
                out = retry
        if 'timed out' in out.get('error', ''):
            cooldown = 300.0
        if 'error' in out and name not in ('farseg', 'infer'):
            # vit sections carry their error inside their own sub-dict
            skipped[name] = out['error']
        else:
            results[name] = out
        pending = {n: 'pending' for n, _ in sections
                   if n not in results and n not in skipped}
        print(json.dumps(_assemble_line(results, {**skipped, **pending},
                                        time.time() - t_start)), flush=True)
        sys.stdout.flush()

    print(json.dumps(_assemble_line(results, skipped,
                                    time.time() - t_start)), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default=None,
                    help='time one non-flagship BASELINE config instead '
                         '(factseg|changestar|changemask|changeos|gan)')
    ap.add_argument('--section', default=None,
                    help='run ONE section in-process '
                         '(infer|farseg|vit512|vit1024|vitinfer)')
    ap.add_argument('--skip-vit', action='store_true',
                    help='primary line without the ViT train workloads')
    ap.add_argument('--vit-remat', default=None,
                    help="remat for the 1024² ViT step (None|'full'|'dots')")
    ap.add_argument('--windows', type=int, default=3,
                    help='timing windows per metric (infer section)')
    ap.add_argument('--prelude-vit', action='store_true',
                    help='infer section only: run a ViT-512 train section '
                         'first in the same process (slide A/B instrument)')
    args = ap.parse_args()
    t_start = time.time()  # EVER_BENCH_BUDGET counts from process start

    # Bound backend acquisition BEFORE touching jax in this process
    # (EVER_BENCH_WAIT seconds, default 30 min; 0 skips the probe).
    # EVER_BENCH_CPU=1 forces the CPU backend (the image pins
    # jax_platforms='axon,cpu' at import; the JAX_PLATFORMS env var is
    # ignored, so this must go through jax.config).
    import os
    force_cpu = os.environ.get('EVER_BENCH_CPU', '') == '1'
    max_wait = 0.0 if force_cpu else float(os.environ.get('EVER_BENCH_WAIT', '1800'))
    err, probed_kind = _wait_for_backend(max_wait) if max_wait > 0 else ('', '')
    if err:
        print(json.dumps({
            'metric': 'farseg_r50_train_tiles_per_sec_per_chip',
            'value': 0.0, 'unit': 'tiles/sec/chip', 'vs_baseline': 0.0,
            'error': f'jax backend unreachable after {max_wait:.0f}s '
                     f'(TPU tunnel down?); no measurement taken: {err}',
        }))
        raise SystemExit(1)

    if force_cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    if args.config:
        _bench_config(args.config)
        return
    if args.section:
        _section_main(args.section, args)
        return

    # CPU (tests/dev): everything in-process, no subprocess overhead.
    # The orchestrator parent must never initialize a TPU backend itself
    # (it would hold a tunnel client while its section children run), so
    # the platform decision uses the subprocess probe's device kind.
    if force_cpu or 'cpu' in probed_kind.lower():
        _cpu_main(args)
        return
    _orchestrate(args, t_start)


def _cpu_main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ever_tpu.parallel.mesh import (batch_sharding, host_to_global,
                                        make_mesh, replicated)
    from ever_tpu.parallel.spmd import (build_train_loop, build_train_step,
                                        create_train_state)

    devices = jax.devices()
    n_chips = len(devices)
    far = _bench_farseg(jax, jnp, np, False, devices, n_chips,
                        (batch_sharding, host_to_global, make_mesh, replicated),
                        (build_train_loop, build_train_step, create_train_state))
    line = {
        'metric': 'farseg_r50_train_tiles_per_sec_per_chip',
        'value': far['value'],
        'unit': '512x512 tiles/sec/chip',
        'vs_baseline': far['vs_baseline'],
        'mfu': far['mfu'],
        'step_time_ms': far['step_time_ms'],
        'step_flops_g': far['step_flops_g'],
        'infer_tiles_per_sec_per_chip': far['infer_tiles_per_sec_per_chip'],
        'infer_vs_baseline': far['infer_vs_baseline'],
        'tta_d4_tiles_per_sec_per_chip': far['tta_d4_tiles_per_sec_per_chip'],
        'int8_infer_tiles_per_sec_per_chip': far['int8_infer_tiles_per_sec_per_chip'],
        'int8_tta_d4_tiles_per_sec_per_chip': far['int8_tta_d4_tiles_per_sec_per_chip'],
        'n_chips': n_chips,
        'global_batch': far['global_batch'],
        'device': devices[0].device_kind,
        'noise': far['noise'],
    }
    print(json.dumps(line))


if __name__ == '__main__':
    main()
