"""Inference-time model building and weight loading.

Parity: ``ever/api/infer_tool.py:16-74`` — build from a config file, from a
config + checkpoint, or from a trained model dir (prefer ``model-best``,
else the highest-numbered checkpoint); plus export.  In JAX a "loaded model"
is ``(module, variables)``; export is an XLA-serialisable jitted apply
(``jax.export``), replacing ``torch.jit.trace``.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ever_tpu.core import checkpoint as ckpt_lib
from ever_tpu.core.builder import make_model
from ever_tpu.core.config import import_config
from ever_tpu.core.logger import info

__all__ = ['build_from_file', 'build_and_load_from_file', 'build_from_model_dir',
           'export_model']


def build_from_file(config_path: str):
    cfg = import_config(config_path)
    return make_model(cfg['model'])


def _load_variables(checkpoint_path: str) -> Tuple[dict, int]:
    obj = ckpt_lib.CheckPoint.load(checkpoint_path)
    if ckpt_lib.is_checkpoint(obj):
        model_state = obj[ckpt_lib.MODEL]
        global_step = int(obj[ckpt_lib.GLOBALSTEP])
    else:
        model_state = obj
        name = Path(checkpoint_path).name
        try:
            global_step = int(name.split('.')[0].split('-')[1])
        except (IndexError, ValueError):
            global_step = 0
    variables = {'params': model_state.get('params', model_state)}
    if model_state.get('batch_stats'):
        variables['batch_stats'] = model_state['batch_stats']
    return variables, global_step


def build_and_load_from_file(config_path: str, checkpoint_path: str):
    """Returns ``(model, variables, global_step)``."""
    model = build_from_file(config_path)
    variables, global_step = _load_variables(checkpoint_path)
    info(f'[Load params] from {checkpoint_path}')
    return model, variables, global_step


def build_from_model_dir(model_dir: str, checkpoint_name: Optional[str] = None):
    """Prefer ``model-best.ckpt``, else the highest ``checkpoint-N.ckpt``
    (parity: ``infer_tool.py:39-67``)."""
    pkl_cfg = os.path.join(model_dir, 'config.pkl')
    py_cfg = os.path.join(model_dir, 'config.py')
    if os.path.exists(pkl_cfg):
        cfg_path = pkl_cfg
    elif os.path.exists(py_cfg):
        cfg_path = py_cfg
    else:
        raise FileNotFoundError('The config file is not found in model_dir.')

    if checkpoint_name is None:
        best = os.path.join(model_dir, 'model-best.ckpt')
        if os.path.exists(best):
            model = build_from_file(cfg_path)
            variables, _ = _load_variables(best)
            info(f'[Load params] from {best}')
            return model, variables, 'best'
        # the checkpoint index is authoritative (and the only way to find
        # orbax checkpoints, which are DIRECTORIES named checkpoint-N)
        import json
        info_fp = os.path.join(model_dir, 'checkpoint_info.json')
        if os.path.exists(info_fp):
            with open(info_fp) as f:
                last = json.load(f).get('last') or {}
            name = last.get('name')
            if name and os.path.exists(os.path.join(model_dir, name)):
                checkpoint_name = name
        if checkpoint_name is None:
            fps = [p for p in Path(model_dir).glob('checkpoint-*')
                   if p.name.replace('checkpoint-', ''
                                     ).replace('.ckpt', '').isdigit()]
            if not fps:
                raise FileNotFoundError(f'no checkpoints in {model_dir}')
            checkpoint_name = max(
                fps, key=lambda p: int(p.name.replace('checkpoint-', '')
                                       .replace('.ckpt', ''))).name
    return build_and_load_from_file(cfg_path, os.path.join(model_dir, checkpoint_name))


def export_model(config_path: str, checkpoint_path: str, input_shape,
                 output_path: str, ptq_calib=None,
                 ptq_act_percentile=None, ptq_except_re=None):
    """Serialise a jitted eval forward with ``jax.export``
    (replaces ``torch.jit.trace`` export, ``infer_tool.py:70-74``).

    ``ptq_calib``: optional iterable of calibration batches — when given,
    the exported program serves int8 W8A8 (``ever_tpu.ops.ptq``): the
    quantized weights and the int8 conv graph are baked into the artifact.
    ``ptq_act_percentile`` selects percentile activation calibration
    (outlier-robust; default abs-max); ``ptq_except_re`` keeps matching
    conv paths in fp (e.g. first/last layer).
    """
    model, variables, _ = build_and_load_from_file(config_path, checkpoint_path)

    if ptq_calib is not None:
        from ever_tpu.ops import make_ptq_predict_fn, ptq_quantize
        qv = ptq_quantize(model, variables, ptq_calib,
                          apply_kwargs=dict(train=False),
                          min_in_features=64,
                          act_percentile=ptq_act_percentile,
                          except_re=ptq_except_re)
        fwd = make_ptq_predict_fn(model, qv, train=False)
    else:
        def fwd(x):
            return model.apply(variables, x, train=False)

    from jax import export as jax_export
    exported = jax_export.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct(tuple(input_shape), jnp.float32))
    with open(output_path, 'wb') as f:
        f.write(exported.serialize())
    info(f'[export model] to {output_path}')
