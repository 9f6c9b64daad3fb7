"""End-to-end LoveDA-workflow run through the public surface (VERDICT r1 #3).

Drives the exact user workflow of the reference
(``ever/core/launcher.py:369-403``, ``ever/metric/evaluate_fn.py:22-127``)
on the synthetic LoveDA stand-in (``tools/make_synthetic_loveda.py``):

  phase train   — ``get_trainer('th_ddp')`` → ``trainer.run()``: FarSeg-R50
                  512² bf16, periodic checkpointing, eval(mIoU table) after
                  train via ``override_evaluate``.
  phase resume  — a FRESH process re-runs with a larger ``num_iters``; the
                  launcher must resume from the last checkpoint (this is the
                  kill-and-resume posture: the first process is gone).
  phase infer   — ``infer_tool.build_from_model_dir`` + whole-scene
                  ``tiled_inference`` over the 1024² Val scenes, mIoU scored
                  with ``PixelMetric``.

Run (TPU or CPU):
    python tools/make_synthetic_loveda.py --root /tmp/synthetic_loveda
    python tools/e2e_loveda.py --phase train  --iters 150
    python tools/e2e_loveda.py --phase resume --iters 300
    python tools/e2e_loveda.py --phase infer
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # robust to any launch cwd / lost editable install
    sys.path.insert(0, REPO)


def _train(args, num_iters):
    from ever_tpu.metric.evaluate_fn import evaluate_pixel_prediction_task
    from ever_tpu.trainer import get_trainer

    argv = [
        '--config_path', os.path.join(
            REPO, f'project_template/configs/{args.config}.py'),
        '--model_dir', args.model_dir,
        '--trainer', 'th_ddp',
        '--mixed_precision', 'bf16',
        # dotted overrides (the reference's free-form `opts` surface)
        'data.train.params.root', args.root,
        'data.train.params.total_batch_size', str(args.batch),
        'data.train.params.drop_last', 'True',   # static jit batch shape
        # in-process loading by default: with a small synthetic dataset the
        # epochs are a handful of steps, and worker pools respawn per epoch
        # (a fresh jax import each time dominated the step wall-clock)
        'data.train.params.num_workers', str(args.num_workers),
        'data.test.params.root', args.root,
        'data.test.params.batch_size', '4',
        'data.test.params.num_workers', str(args.num_workers),
        'train.num_iters', str(num_iters),
        'train.log_interval_step', '10',
        'train.save_ckpt_interval_epoch', str(args.save_interval),
        'train.eval_after_train', 'True',
        'learning_rate.params.max_iters', str(args.total_iters),
        'learning_rate.params.warmup.step',
        str(max(1, min(50, args.total_iters // 6))),
    ]
    for kv in args.opts:
        argv.extend(kv.split('=', 1))
    trainer = get_trainer('th_ddp', argv)()
    result = trainer.run(after_construct_launcher_callbacks=[
        lambda tl: tl.override_evaluate(
            evaluate_pixel_prediction_task(num_classes=7, desc='val'))])
    print(f'[e2e] phase done at global_step='
          f'{result["launcher"].global_step}', flush=True)


def _infer(args):
    import glob
    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from ever_tpu.api import infer_tool
    from ever_tpu.magic.tiled import tiled_inference
    from ever_tpu.metric.pixel import PixelMetric

    model, variables, step = infer_tool.build_from_model_dir(args.model_dir)
    print(f'[e2e] loaded checkpoint @ {step}', flush=True)

    def predict(tiles):
        return model.apply(variables, tiles, train=False)

    fns = {'fp': predict}
    if args.ptq:
        # int8 PTQ accuracy proof on the TRAINED model: calibrate on train
        # scenes, score val mIoU for fp and int8 side by side (ops/ptq.py)
        from ever_tpu.ops import make_ptq_predict_fn, ptq_quantize
        calib = []
        for dom in ('Urban', 'Rural'):
            for ip in sorted(glob.glob(os.path.join(
                    args.root, 'Train', dom, 'images_png', '*.png')))[:2]:
                s = np.asarray(Image.open(ip), np.uint8).astype(np.float32)
                tiles = np.stack([s[y:y + 512, x:x + 512]
                                  for y in (0, 512) for x in (0, 512)])
                calib.append(jnp.asarray(tiles))
        qv = ptq_quantize(model, variables, calib,
                          apply_kwargs=dict(train=False), min_in_features=64,
                          act_percentile=args.ptq_percentile,
                          except_re=args.ptq_except)
        fns['int8'] = make_ptq_predict_fn(model, qv, train=False)

    pms = {name: PixelMetric(7, args.model_dir) for name in fns}
    for dom in ('Urban', 'Rural'):
        for ip in sorted(glob.glob(os.path.join(
                args.root, 'Val', dom, 'images_png', '*.png'))):
            scene = np.asarray(Image.open(ip), np.uint8).astype(np.float32)
            raw = np.asarray(Image.open(ip.replace('images_png', 'masks_png')))
            y_true = np.where(raw == 0, 255, raw - 1).astype(np.int32)
            for name, fn in fns.items():
                probs = tiled_inference(fn, jnp.asarray(scene), 512, 256, 7,
                                        tile_batch=args.tile_batch)
                y_pred = np.asarray(jnp.argmax(probs, -1))
                pms[name].forward(y_true[None], y_pred[None])
            print(f'[e2e] scored {ip}', flush=True)
    mious = {}
    for name, pm in pms.items():
        table = pm.summary_all()
        mean_row = [r for r in table.rows if 'mean' in r[:2]][0]
        mious[name] = float(mean_row[list(table.field_names).index('iou')])
        print(f'[e2e] {name} mIoU = {mious[name]:.5f}', flush=True)
    if args.ptq:
        print(f'[e2e] PTQ mIoU delta = {mious["int8"] - mious["fp"]:+.5f}',
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--phase', choices=('train', 'resume', 'infer'),
                    required=True)
    ap.add_argument('--root', default='/tmp/synthetic_loveda')
    ap.add_argument('--model-dir', default='/tmp/e2e_loveda_run')
    ap.add_argument('--config', default='farseg_r50_loveda',
                    help='project_template/configs/<name>.py — e.g. '
                         'dinoseg_vitl_loveda for the ViT fine-tune path '
                         '(VERDICT r3 #5: ViT PTQ mIoU gate)')
    ap.add_argument('--iters', type=int, default=150)
    ap.add_argument('--total-iters', type=int, default=300,
                    help='LR schedule horizon (shared across phases)')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--tile-batch', type=int, default=8)
    ap.add_argument('--num-workers', type=int, default=0)
    ap.add_argument('--save-interval', type=int, default=2,
                    help='save_ckpt_interval_epoch')
    ap.add_argument('--ptq-except', default=None,
                    help="regex of conv paths to keep in fp (e.g. "
                         "'resnet/conv1$|classifier$' = first+last layer, "
                         "the standard PTQ accuracy guard)")
    ap.add_argument('--ptq-percentile', type=float, default=None,
                    help='activation calibration percentile (e.g. 99.9); '
                         'default abs-max')
    ap.add_argument('--ptq', action='store_true',
                    help='also score the int8 PTQ serving path (mIoU delta)')
    ap.add_argument('--opt', action='append', default=[], dest='opts',
                    metavar='KEY=VALUE',
                    help='extra dotted config overrides for the train phase, '
                         'e.g. --opt model.params.backbone.attn_impl=xla '
                         '(avoids the Mosaic compile landmine for the ViT '
                         'PTQ gate, where kernel speed is irrelevant)')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault('XLA_FLAGS',
                              '--xla_force_host_platform_device_count=8')
        import jax
        jax.config.update('jax_platforms', 'cpu')

    if args.phase in ('train', 'resume'):
        _train(args, args.iters)
    else:
        _infer(args)


if __name__ == '__main__':
    main()
