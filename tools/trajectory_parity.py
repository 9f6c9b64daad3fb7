"""Extended training-trajectory parity vs the torch reference (VERDICT r1 #3,
r2 #3).

Runs N full optimizer steps of a segmentation model (reference torch
encoder+head from /root/reference vs our flax model with transplanted init
weights, identical batches / poly LR / SGD momentum / global clip) and
records per-step losses; optionally repeats our side in bf16 to document the
bf16-vs-fp32 drift.  Writes a JSON report.

``--model`` picks the trunk family (VERDICT r2 #3 — FarSeg validated the
ResNet/FPN path; HRNet exercises the multi-branch fusion topology, ViT the
BN-free LN/RoPE transformer path end-to-end):

- ``farseg``  — FarSeg ResNet (ever/module/resnet.py + fs_relation.py)
- ``hrnet``   — HRNetEncoder-w18 + HRNetHead (ever/module/hrnet.py:29-108,
  hrnet_head.py:28-49)
- ``vit``     — DINOv3 ViT-S trunk + linear dense head == our DinoSeg
  (ever/module/dinov3/models/vision_transformer.py:71-340,
  get_intermediate_layers :296-333)

Usage:
    python tools/trajectory_parity.py --steps 50 --size 512 --batch 8 \
        --resnet resnet50 --bf16 --out docs/parity/trajectory_512_b8.json
    python tools/trajectory_parity.py --model hrnet --steps 50 --size 256 \
        --batch 2 --out docs/parity/trajectory_hrnet_w18.json
    python tools/trajectory_parity.py --model vit --steps 50 --size 256 \
        --batch 4 --out docs/parity/trajectory_vit_s.json

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

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # robust to any launch cwd / lost editable install
    sys.path.insert(0, _REPO)


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
    if getattr(args, 'perturb', 0.0):
        with torch.no_grad():
            next(enc.parameters()).view(-1)[0] += args.perturb
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


def _torch_sgd_poly_loop(args, params, schedule, step_fn):
    """Shared torch hot loop: poly LR → forward/CE → clip 35 → SGD step."""
    import torch
    opt = torch.optim.SGD(params, lr=0.01, momentum=0.9)
    losses = []
    for i in range(args.steps):
        t0 = time.time()
        for g in opt.param_groups:
            g['lr'] = float(schedule(i))
        loss = step_fn(i)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, 35.0)
        opt.step()
        losses.append(float(loss))
        print(f'[torch] step {i}: loss={losses[-1]:.6f} '
              f'({time.time() - t0:.1f}s)', flush=True)
    return losses


def _jax_loop(args, step, state, xs, ys, dtype, loss_key='cls_loss'):
    import jax.numpy as jnp
    losses = []
    for i in range(args.steps):
        t0 = time.time()
        state, metrics = step(state, (jnp.asarray(xs[i]), jnp.asarray(ys[i])))
        losses.append(float(metrics[loss_key]))
        print(f'[jax/{dtype}] step {i}: loss={losses[-1]:.6f} '
              f'({time.time() - t0:.1f}s)', flush=True)
    return losses


def run_torch_hrnet(args, xs, ys, schedule, tmpdir):
    """HRNetEncoder-w18 + HRNetHead + CE (ever/module/hrnet.py:29-108,
    hrnet_head.py:28-49)."""
    import numpy as np
    import torch
    import torch.nn.functional as F
    _stub_reference_deps()
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    from ever.module.hrnet import HRNetEncoder as TorchHRNetEncoder
    from ever.module.hrnet_head import HRNetHead as TorchHRNetHead

    torch.manual_seed(0)
    enc = TorchHRNetEncoder(dict(hrnet_type='hrnetv2_w18', pretrained=False))
    head = TorchHRNetHead(dict(hrnet_decoder=dict(in_channels=270),
                               num_classes=args.classes, upsample_scale=4.0))
    if getattr(args, 'perturb', 0.0):
        # self-noise floor probe: a one-ulp-scale poke at ONE weight shows
        # how fast this workload's own chaos amplifies fp noise (the honest
        # yardstick for cross-framework trajectory diffs)
        with torch.no_grad():
            next(enc.parameters()).view(-1)[0] += args.perturb
    # our ConvBlock is bias-free before BN (bias is absorbed by the batch
    # statistics either way) — zero it so eval forwards also match exactly
    head.head[0].fuse_conv[0].bias.data.zero_()
    # the vendored trunk key prefix is 'hrnet.' on HRNetEncoder — strip so
    # weight_io's hrnet converter sees canonical keys
    torch.save({k[len('hrnet.'):]: v for k, v in enc.state_dict().items()},
               os.path.join(tmpdir, 'enc0.pth'))
    torch.save(head.state_dict(), os.path.join(tmpdir, 'head0.pth'))
    enc.train(), head.train()
    params = list(enc.parameters()) + list(head.parameters())

    def step(i):
        xb = torch.from_numpy(np.transpose(xs[i], (0, 3, 1, 2)))
        yb = torch.from_numpy(ys[i].astype(np.int64))
        logits = head(enc(xb))
        return F.cross_entropy(logits, yb, ignore_index=255)

    return _torch_sgd_poly_loop(args, params, schedule, step)


def _transplant_hrnet_head(tmpdir, params, batch_stats, classes):
    """head0.pth (fuse_conv conv+bn, classifier conv) → our HRNetHead leaves,
    located by shape in the 'head' subtree (torch Sequential indices vs flax
    names make the generic path matcher inapplicable here)."""
    import numpy as np
    import torch
    from ever_tpu.util.weight_io import flatten_tree, unflatten_tree

    sd = {k: v.numpy() for k, v in
          torch.load(os.path.join(tmpdir, 'head0.pth'),
                     map_location='cpu', weights_only=False).items()}
    pf = flatten_tree(params)
    bf = flatten_tree(batch_stats)

    def one(flat, pred):
        keys = [k for k in flat if k.startswith('head/') and pred(k, flat[k])]
        assert len(keys) == 1, keys
        return keys[0]

    fuse_w = np.transpose(sd['head.0.fuse_conv.0.weight'], (2, 3, 1, 0))
    cls_w = np.transpose(sd['head.1.weight'], (2, 3, 1, 0))
    pf[one(pf, lambda k, v: k.endswith('/kernel') and v.shape == fuse_w.shape
           and v.shape[2] == v.shape[3])] = fuse_w
    pf[one(pf, lambda k, v: k.endswith('/kernel') and v.shape == cls_w.shape)] = cls_w
    pf[one(pf, lambda k, v: k.endswith('/scale'))] = sd['head.0.fuse_conv.1.weight']
    pf[one(pf, lambda k, v: k.endswith('/bias') and v.shape == (fuse_w.shape[3],))] = \
        sd['head.0.fuse_conv.1.bias']
    pf[one(pf, lambda k, v: k.endswith('/bias') and v.shape == (classes,))] = \
        sd['head.1.bias']
    bf[one(bf, lambda k, v: k.endswith('/mean'))] = sd['head.0.fuse_conv.1.running_mean']
    bf[one(bf, lambda k, v: k.endswith('/var'))] = sd['head.0.fuse_conv.1.running_var']
    return unflatten_tree(pf), unflatten_tree(bf)


def run_jax_hrnet(args, xs, ys, tmpdir, dtype):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from ever_tpu.core import builder
    from ever_tpu.module.heads import HRNetHead
    from ever_tpu.module.hrnet import HRNetEncoder
    from ever_tpu.module import loss as L
    from ever_tpu.parallel.spmd import build_train_step, create_train_state
    from ever_tpu.util import weight_io

    classes = args.classes

    class HRSeg(nn.Module):
        @nn.compact
        def __call__(self, x, y=None, train=False):
            feats = HRNetEncoder(dict(hrnet_type='hrnetv2_w18', dtype=dtype),
                                 name='encoder')(x, train=train)
            logits = HRNetHead(dict(hrnet_decoder=dict(in_channels=270),
                                    num_classes=classes, upsample_scale=4.0,
                                    dtype=dtype),
                               name='head')(feats, train=train)
            logits = logits.astype(jnp.float32)
            if train and y is not None:
                return dict(cls_loss=L.softmax_ce_loss_with_logits(
                    logits, y, ignore_index=255))
            return nn.softmax(logits, axis=-1)

    model = HRSeg()
    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9,
                                        max_iters=args.steps)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule, grad_clip=dict(max_norm=35.0))

    state = create_train_state(model, tx, (xs[0], ys[0]), rng=jax.random.key(0))
    params, bs = weight_io.load_weights(os.path.join(tmpdir, 'enc0.pth'),
                                        state.params, state.batch_stats,
                                        log=False)
    params, bs = _transplant_hrnet_head(tmpdir, params, bs, classes)
    state = state.replace(params=params, batch_stats=bs)
    step = build_train_step(model, tx, schedule, donate=False)
    return _jax_loop(args, step, state, xs, ys, dtype)


def run_torch_vit(args, xs, ys, schedule, tmpdir):
    """DINOv3 ViT-S trunk + linear dense head (== our DinoSeg protocol:
    get_intermediate_layers(n=1, reshape=True) → 1x1 conv → x16 bilinear,
    vision_transformer.py:296-333)."""
    import numpy as np
    import torch
    import torch.nn.functional as F
    _stub_reference_deps()
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    from ever.module.dinov3.models.vision_transformer import (
        DinoVisionTransformer as TorchViT)

    torch.manual_seed(0)
    trunk = TorchViT(img_size=args.size, patch_size=16, embed_dim=384,
                     depth=12, num_heads=6, ffn_ratio=4, qkv_bias=True,
                     n_storage_tokens=4, pos_embed_rope_dtype='fp32')
    trunk.init_weights()   # params are torch.empty until this is called
    if getattr(args, 'perturb', 0.0):
        with torch.no_grad():
            next(trunk.parameters()).view(-1)[0] += args.perturb
    head = torch.nn.Conv2d(384, args.classes, 1)
    torch.save(trunk.state_dict(), os.path.join(tmpdir, 'trunk0.pth'))
    torch.save(head.state_dict(), os.path.join(tmpdir, 'vhead0.pth'))
    trunk.train(), head.train()
    params = list(trunk.parameters()) + list(head.parameters())

    def step(i):
        xb = torch.from_numpy(np.transpose(xs[i], (0, 3, 1, 2)))
        yb = torch.from_numpy(ys[i].astype(np.int64))
        feat = trunk.get_intermediate_layers(xb, n=1, reshape=True)[0]
        logits = F.interpolate(head(feat), scale_factor=16, mode='bilinear',
                               align_corners=False)
        return F.cross_entropy(logits, yb, ignore_index=255)

    return _torch_sgd_poly_loop(args, params, schedule, step)


def run_jax_vit(args, xs, ys, tmpdir, dtype):
    import jax
    import numpy as np
    import torch
    from ever_tpu.core import builder
    from ever_tpu.parallel.spmd import build_train_step, create_train_state
    from ever_tpu.util import weight_io

    model = builder.make_model({'type': 'DinoSeg', 'params': dict(
        backbone=dict(name='vit_small'),
        classes=args.classes,
        dtype=dtype)})
    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9,
                                        max_iters=args.steps)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule, grad_clip=dict(max_norm=35.0))

    state = create_train_state(model, tx, (xs[0], ys[0]), rng=jax.random.key(0))
    params, _ = weight_io.load_weights(os.path.join(tmpdir, 'trunk0.pth'),
                                       state.params, log=False)
    hd = {k: v.numpy() for k, v in
          torch.load(os.path.join(tmpdir, 'vhead0.pth'),
                     map_location='cpu', weights_only=False).items()}
    params['head_classifier'] = dict(
        kernel=np.transpose(hd['weight'][:, :, 0, 0], (1, 0)),
        bias=hd['bias'])
    state = state.replace(params=params)
    step = build_train_step(model, tx, schedule, donate=False)
    return _jax_loop(args, step, state, xs, ys, dtype)


RUNNERS = {
    'farseg': (run_torch, run_jax),
    'hrnet': (run_torch_hrnet, run_jax_hrnet),
    'vit': (run_torch_vit, run_jax_vit),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='farseg', choices=sorted(RUNNERS))
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--classes', type=int, default=7)
    ap.add_argument('--resnet', default='resnet50')
    ap.add_argument('--bf16', action='store_true',
                    help='also run our side in bf16 and record the drift')
    ap.add_argument('--out', default='docs/parity/trajectory.json')
    ap.add_argument('--tmpdir', default='/tmp/traj_parity')
    ap.add_argument('--selfnoise', action='store_true',
                    help='run torch TWICE (second with a 1e-7 single-weight '
                         'perturbation) and report the workload\'s own '
                         'chaos floor instead of the cross-framework diff')
    args = ap.parse_args()
    args.perturb = 0.0

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

    torch_runner, jax_runner = RUNNERS[args.model]
    t_losses = torch_runner(args, xs, ys, schedule, args.tmpdir)
    if args.selfnoise:
        args.perturb = 1e-7
        t2 = torch_runner(args, xs, ys, schedule, args.tmpdir)
        report = dict(
            model=args.model, mode='selfnoise', steps=args.steps,
            size=args.size, batch=args.batch,
            torch_losses=t_losses, torch_perturbed_losses=t2,
            selfnoise_max_abs_diff=float(np.max(np.abs(
                np.array(t_losses) - np.array(t2)))),
            selfnoise_max_rel_diff=float(np.max(np.abs(
                (np.array(t_losses) - np.array(t2)) /
                np.maximum(np.array(t_losses), 1e-8)))),
        )
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=1)
        print(json.dumps({k: v for k, v in report.items()
                          if not k.endswith('losses')}, indent=1))
        return
    j_losses = jax_runner(args, xs, ys, args.tmpdir, 'float32')
    report = dict(
        model=args.model,
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
        jb = jax_runner(args, xs, ys, args.tmpdir, 'bfloat16')
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
