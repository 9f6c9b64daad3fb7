"""Extended training-trajectory parity vs the torch reference (VERDICT r1 #3).

Runs N full optimizer steps of FarSeg (reference torch encoder+head from
/root/reference vs our flax model with transplanted init weights, identical
batches / poly LR / SGD momentum / global clip) at benchmark geometry and
records per-step losses; optionally repeats our side in bf16 to document the
bf16-vs-fp32 drift.  Writes a JSON report.

Usage:
    python tools/trajectory_parity.py --steps 50 --size 512 --batch 8 \
        --resnet resnet50 --bf16 --out docs/parity/trajectory_512_b8.json

Parity anchors: ever/core/launcher.py:300-362 (the hot loop semantics),
ever/module/fs_relation.py:167-206, ever/opt/learning_rate.py:89-120.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types


def _stub_reference_deps():
    def stub(name, **attrs):
        try:
            __import__(name)
            return
        except ImportError:
            pass
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod

    class _T:
        def __init__(self, *a, **k):
            pass

    stub('wandb', run=None, init=lambda **k: None, log=lambda *a, **k: None)
    stub('prettytable', PrettyTable=type('PrettyTable', (), {}))
    stub('pandas', DataFrame=type('DataFrame', (), {}))
    stub('tqdm', tqdm=lambda x, **k: x)
    stub('albumentations', DualTransform=_T, ImageOnlyTransform=_T,
         RandomScale=_T, BasicTransform=_T, Compose=_T)
    stub('albumentations.pytorch', ToTensorV2=_T)


def head_cfg(classes, chans):
    return dict(
        fpn=dict(in_channels_list=chans, out_channels=32),
        fs_relation=dict(scene_embedding_channels=chans[-1],
                         in_channels_list=(32,) * 4,
                         out_channels=32, scale_aware_proj=True),
        fpn_decoder=dict(in_channels=32, out_channels=32,
                         in_feat_output_strides=(4, 8, 16, 32),
                         out_feat_output_stride=4,
                         classifier_config=dict(scale_factor=4.0,
                                                num_classes=classes,
                                                kernel_size=1)))


def run_torch(args, xs, ys, schedule, tmpdir):
    import numpy as np
    import torch
    import torch.nn.functional as F
    _stub_reference_deps()
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    from ever.module.resnet import ResNetEncoder as TorchEncoder
    from ever.module.fs_relation import FarSegHead as TorchFarSegHead

    chans = (64, 128, 256, 512) if args.resnet == 'resnet18' else \
        (256, 512, 1024, 2048)
    torch.manual_seed(0)
    enc = TorchEncoder(dict(resnet_type=args.resnet, pretrained=False))
    head = TorchFarSegHead(dict(head_cfg(args.classes, chans)))
    torch.save(enc.state_dict(), os.path.join(tmpdir, 'enc0.pth'))
    torch.save(head.state_dict(), os.path.join(tmpdir, 'head0.pth'))
    enc.train(), head.train()
    params = list(enc.parameters()) + list(head.parameters())
    opt = torch.optim.SGD(params, lr=0.01, momentum=0.9)

    losses, times = [], []
    for i in range(args.steps):
        t0 = time.time()
        for g in opt.param_groups:
            g['lr'] = float(schedule(i))
        xb = torch.from_numpy(np.transpose(xs[i], (0, 3, 1, 2)))
        yb = torch.from_numpy(ys[i].astype(np.int64))
        logits = head(enc(xb))
        loss = F.cross_entropy(logits, yb, ignore_index=255)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, 35.0)
        opt.step()
        losses.append(float(loss))
        times.append(time.time() - t0)
        print(f'[torch] step {i}: loss={losses[-1]:.6f} ({times[-1]:.1f}s)',
              flush=True)
    return losses


def run_jax(args, xs, ys, tmpdir, dtype):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ever_tpu.core import builder
    from ever_tpu.parallel.spmd import build_train_step, create_train_state
    from ever_tpu.util import weight_io

    chans = (64, 128, 256, 512) if args.resnet == 'resnet18' else \
        (256, 512, 1024, 2048)
    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type=args.resnet),
        head=dict(fpn=dict(in_channels_list=chans, out_channels=32),
                  fs_relation=dict(scene_embedding_channels=chans[-1],
                                   in_channels_list=(32,) * 4,
                                   out_channels=32, scale_aware_proj=True),
                  fpn_decoder=dict(in_channels=32, out_channels=32,
                                   in_feat_output_strides=(4, 8, 16, 32),
                                   out_feat_output_stride=4,
                                   align_corners=True)),
        classes=args.classes,
        loss=dict(ignore_index=255, ce=dict()),
        dtype=dtype)})
    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9,
                                        max_iters=args.steps)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule, grad_clip=dict(max_norm=35.0))

    state = create_train_state(model, tx, (xs[0], ys[0]), rng=jax.random.key(0))
    params, bs = state.params, state.batch_stats
    params, bs = weight_io.load_weights(os.path.join(tmpdir, 'enc0.pth'),
                                        params, bs, log=False)
    params, bs = weight_io.load_weights(os.path.join(tmpdir, 'head0.pth'),
                                        params, bs, log=False)
    state = state.replace(params=params, batch_stats=bs)
    step = build_train_step(model, tx, schedule, donate=False)
    losses = []
    for i in range(args.steps):
        t0 = time.time()
        state, metrics = step(state, (jnp.asarray(xs[i]), jnp.asarray(ys[i])))
        losses.append(float(metrics['cls_loss']))
        print(f'[jax/{dtype}] step {i}: loss={losses[-1]:.6f} '
              f'({time.time() - t0:.1f}s)', flush=True)
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--classes', type=int, default=7)
    ap.add_argument('--resnet', default='resnet50')
    ap.add_argument('--bf16', action='store_true',
                    help='also run our side in bf16 and record the drift')
    ap.add_argument('--out', default='docs/parity/trajectory.json')
    ap.add_argument('--tmpdir', default='/tmp/traj_parity')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    from ever_tpu.core import builder

    os.makedirs(args.tmpdir, exist_ok=True)
    rng = np.random.default_rng(7)
    xs = rng.normal(size=(args.steps, args.batch, args.size, args.size, 3)
                    ).astype(np.float32)
    ys = rng.integers(0, args.classes,
                      size=(args.steps, args.batch, args.size, args.size)
                      ).astype(np.int32)
    ys[:, :, 0, 0] = 255

    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9,
                                        max_iters=args.steps)})

    t_losses = run_torch(args, xs, ys, schedule, args.tmpdir)
    j_losses = run_jax(args, xs, ys, args.tmpdir, 'float32')
    report = dict(
        steps=args.steps, size=args.size, batch=args.batch,
        resnet=args.resnet, classes=args.classes,
        torch_losses=t_losses, jax_fp32_losses=j_losses,
        fp32_max_abs_diff=float(np.max(np.abs(np.array(t_losses) -
                                              np.array(j_losses)))),
        fp32_max_rel_diff=float(np.max(np.abs(
            (np.array(t_losses) - np.array(j_losses)) /
            np.maximum(np.array(t_losses), 1e-8)))),
    )
    if args.bf16:
        jb = run_jax(args, xs, ys, args.tmpdir, 'bfloat16')
        report['jax_bf16_losses'] = jb
        report['bf16_vs_fp32_max_abs_diff'] = float(np.max(np.abs(
            np.array(jb) - np.array(j_losses))))
        report['bf16_vs_torch_max_rel_diff'] = float(np.max(np.abs(
            (np.array(t_losses) - np.array(jb)) /
            np.maximum(np.array(t_losses), 1e-8))))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if not k.endswith('losses')}, indent=1))


if __name__ == '__main__':
    main()
