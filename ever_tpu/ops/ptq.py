"""Post-training int8 quantization (W8A8) for conv-net serving.

The reference's low-precision serving story is GPU-bound: fp8 linears via
``torch._scaled_mm`` (``ever/module/dinov3/layers/fp8_linear.py:46-141``)
and 2:4 sparsity (``sparse_linear.py:19-90``).  The TPU-native analog for
the conv-heavy segmentation zoo is int8 convolution: the v5e MXU runs
s8×s8→s32 at twice the bf16 rate, and measured end-to-end (probe recorded
in ``docs/PERFORMANCE.md``) int8+requant convs beat bf16 by 1.4-1.9× at
FarSeg serving shapes.

Design — zero model-code changes, pure function transforms:

- :func:`calibrate_int8` runs calibration batches through the UNMODIFIED
  model under a :func:`flax.linen.intercept_methods` interceptor that
  ``sow``-records each ``nn.Conv``/``nn.Dense`` input abs-max into a
  mutable collection (Dense covers ViT serving: qkv/proj/MLP linears).
- :func:`quantize_convs` turns (variables, stats) into a ``'ptq'``
  collection holding per-conv int8 kernels, per-output-channel weight
  scales, and per-tensor activation scales.  Symmetric, [-127, 127].
- :func:`ptq_apply` / :func:`make_ptq_predict_fn` run the model with a
  serving interceptor: any conv that has ``'ptq'`` variables quantizes its
  input, convolves int8×int8→int32 on the MXU, and rescales the
  accumulator (fused by XLA into the conv epilogue); everything else
  (BN affine, activations, resizes, non-conv layers) stays bf16/fp32.

The whole pipeline is jit/shard-compatible: interceptors act at trace
time, so a ``make_ptq_predict_fn`` closure drops straight into
:func:`ever_tpu.magic.tiled.tiled_inference` (including the mesh-sharded
multi-chip path).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import traverse_util
from flax.linen import linear as _fl_linear

__all__ = ['calibrate_int8', 'quantize_convs', 'ptq_quantize',
           'ptq_apply', 'make_ptq_predict_fn']

_STATS_COL = 'ptq_stats'
_QCOL = 'ptq'


# ---------------------------------------------------------------------------
# calibration

def _act_stat(x, percentile: Optional[float]):
    """Scalar activation-range statistic for one conv/dense input.

    ``percentile=None`` → exact abs-max.  Otherwise the q-th percentile of
    |x| over a strided subsample (≤ ~1M elements: calibration runs a sort,
    and a 0.0001% stride bias is irrelevant next to the outlier clipping
    the percentile exists to provide).  Percentile calibration clips the
    rare activation outliers that otherwise inflate the per-tensor scale
    and quantize every typical value into a handful of int8 bins — the
    standard PTQ accuracy fix (reference analog: the fp8 per-tensor scale
    recompute in ever/module/dinov3/layers/fp8_linear.py:46-141 has the
    same outlier sensitivity).
    """
    ax = jnp.abs(x.astype(jnp.float32)).ravel()
    if percentile is None:
        return jnp.max(ax)
    stride = max(1, ax.size // (1 << 20))
    return jnp.percentile(ax[::stride], percentile)


def _make_calib_interceptor(percentile: Optional[float]):
    def _calib_interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, (nn.Conv, nn.Dense))
                and context.method_name == '__call__' and args):
            x = args[0]
            if hasattr(x, 'ndim') and x.ndim >= 2:
                mod.sow(_STATS_COL, 'absmax',
                        _act_stat(x, percentile),
                        reduce_fn=jnp.maximum,
                        init_fn=lambda: jnp.zeros((), jnp.float32))
        return next_fn(*args, **kwargs)
    return _calib_interceptor


def calibrate_int8(model, variables, batches: Iterable,
                   apply_kwargs: Optional[Dict[str, Any]] = None,
                   act_percentile: Optional[float] = None) -> Dict:
    """Run calibration batches; return per-conv input range stats.

    ``batches`` yields model inputs (arrays, or tuples of positional args).
    Stats are reduced with a running max across batches on the host, so any
    number of batches costs O(#convs) host memory.  ``act_percentile``
    (e.g. 99.9) replaces the abs-max activation statistic with a percentile
    of |x| — robust to activation outliers (see :func:`_act_stat`).
    """
    apply_kwargs = dict(apply_kwargs or {})

    # variables ride as a jit ARGUMENT, never a closure: closure params
    # embed as compile-request constants, and on the tunneled backend the
    # remote_compile RPC dies serializing big models (ViT-L's 600 MB sat
    # >17 min in THIS function before the fix — docs/PERFORMANCE.md
    # 'remote-compile constants')
    @jax.jit
    def one(v, args):
        with nn.intercept_methods(_make_calib_interceptor(act_percentile)):
            _, st = model.apply(v, *args, mutable=[_STATS_COL],
                                **apply_kwargs)
        return st[_STATS_COL]

    stats = None
    for b in batches:
        args = b if isinstance(b, (tuple, list)) else (b,)
        st = jax.device_get(one(variables, tuple(args)))
        stats = st if stats is None else jax.tree.map(np.maximum, stats, st)
    if stats is None:
        raise ValueError('calibrate_int8: no calibration batches provided')
    return stats


# ---------------------------------------------------------------------------
# weight/scale construction

def quantize_convs(variables: Dict, stats: Dict, *,
                   min_in_features: int = 0,
                   except_re: Optional[str] = None) -> Dict:
    """Build serving variables: ``variables`` + a ``'ptq'`` collection.

    Per eligible conv (4-D kernel seen during calibration):
    ``kernel_q`` int8 (per-output-channel symmetric), ``w_scale`` fp32
    [Cout], ``x_scale`` fp32 scalar (per-tensor symmetric input scale).

    ``min_in_features`` skips convs whose kh·kw·Cin/g receptive volume is
    below the threshold (tiny contractions gain nothing on the MXU);
    ``except_re`` skips convs whose '/'-joined path matches (e.g. the
    final classifier).
    """
    params = traverse_util.flatten_dict(variables['params'])
    flat_stats = traverse_util.flatten_dict(stats)
    q = {}
    for key, amax in flat_stats.items():
        if key[-1] != 'absmax':
            continue
        path = key[:-1]
        # sow() accumulates into a tuple unless reduce_fn merges — with our
        # reduce_fn the value is a bare scalar, but tolerate tuples anyway
        if isinstance(amax, (tuple, list)):
            amax = max(float(a) for a in amax) if amax else 0.0
        amax = float(amax)
        kernel = params.get(path + ('kernel',))
        # 4-D: conv (kh,kw,Cin/g,Cout); 2-D: dense (in,out)
        if kernel is None or getattr(kernel, 'ndim', 0) not in (2, 4):
            continue
        k = np.asarray(jax.device_get(kernel), np.float32)
        if int(np.prod(k.shape[:-1])) < min_in_features:
            continue
        name = '/'.join(path)
        if except_re is not None and re.search(except_re, name):
            continue
        if not np.isfinite(amax) or amax <= 0.0:
            continue
        w_absmax = np.max(np.abs(k), axis=tuple(range(k.ndim - 1)))
        if not np.all(np.isfinite(w_absmax)):
            continue
        w_scale = np.maximum(w_absmax / 127.0, 1e-12).astype(np.float32)
        k_q = np.clip(np.rint(k / w_scale), -127, 127).astype(np.int8)
        x_scale = np.float32(max(amax / 127.0, 1e-12))
        q[path + ('kernel_q',)] = jnp.asarray(k_q)
        q[path + ('w_scale',)] = jnp.asarray(w_scale)
        q[path + ('x_scale',)] = jnp.asarray(x_scale)
    if not q:
        raise ValueError('quantize_convs: no eligible convs found '
                         '(check calibration stats / filters)')
    out = dict(variables)
    out[_QCOL] = traverse_util.unflatten_dict(q)
    return out


def ptq_quantize(model, variables, batches: Iterable, *,
                 min_in_features: int = 0,
                 except_re: Optional[str] = None,
                 apply_kwargs: Optional[Dict[str, Any]] = None,
                 act_percentile: Optional[float] = None) -> Dict:
    """One-call calibrate + quantize. Returns serving variables."""
    stats = calibrate_int8(model, variables, batches,
                           apply_kwargs=apply_kwargs,
                           act_percentile=act_percentile)
    return quantize_convs(variables, stats,
                          min_in_features=min_in_features,
                          except_re=except_re)


# ---------------------------------------------------------------------------
# serving

def _maybe_broadcast(v, n):
    if v is None:
        return (1,) * n
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def _serve_interceptor(next_fn, args, kwargs, context):
    mod = context.module
    if (context.method_name != '__call__' or not args
            or not isinstance(mod, (nn.Conv, nn.Dense))
            or not mod.has_variable(_QCOL, 'kernel_q')):
        return next_fn(*args, **kwargs)
    if isinstance(mod, nn.Dense):
        return _dense_int8(next_fn, args, kwargs, mod)
    x = args[0]
    ks = mod.kernel_size
    kernel_size = (ks,) if isinstance(ks, int) else tuple(ks)
    # int8 fast path covers the framework's conv vocabulary (2-D, shared
    # weights, zero padding, no input dilation, no kernel mask); anything
    # else falls back to the fp conv — correctness first.
    if (len(kernel_size) != 2 or getattr(x, 'ndim', 0) != 4
            or not mod.shared_weights or mod.mask is not None
            or any(d != 1 for d in _maybe_broadcast(mod.input_dilation, 2))):
        return next_fn(*args, **kwargs)
    padding = _fl_linear.canonicalize_padding(mod.padding, 2)
    if isinstance(padding, str) and padding not in ('SAME', 'VALID'):
        return next_fn(*args, **kwargs)

    k_q = mod.get_variable(_QCOL, 'kernel_q')
    w_scale = mod.get_variable(_QCOL, 'w_scale')
    x_scale = mod.get_variable(_QCOL, 'x_scale')
    strides = _maybe_broadcast(mod.strides, 2)
    kernel_dilation = _maybe_broadcast(mod.kernel_dilation, 2)

    inv = (1.0 / x_scale).astype(jnp.float32)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                   -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_q, k_q, strides, padding,
        rhs_dilation=kernel_dilation,
        feature_group_count=mod.feature_group_count,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (x_scale * w_scale)
    if mod.use_bias and mod.has_variable('params', 'bias'):
        y = y + mod.get_variable('params', 'bias').astype(jnp.float32)
    out_dtype = mod.dtype or jnp.promote_types(x.dtype, mod.param_dtype)
    return y.astype(out_dtype)


def _dense_int8(next_fn, args, kwargs, mod):
    """int8×int8→int32 matmul for an ``nn.Dense`` with ptq variables
    (ViT serving: qkv/proj/MLP linears — the TPU analog of the reference's
    fp8 linears, ``ever/module/dinov3/layers/fp8_linear.py:46-141``)."""
    x = args[0]
    if (getattr(x, 'ndim', 0) < 1
            or mod.dot_general is not None
            or getattr(mod, 'dot_general_cls', None) is not None):
        return next_fn(*args, **kwargs)
    k_q = mod.get_variable(_QCOL, 'kernel_q')
    w_scale = mod.get_variable(_QCOL, 'w_scale')
    x_scale = mod.get_variable(_QCOL, 'x_scale')
    inv = (1.0 / x_scale).astype(jnp.float32)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                   -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, k_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (x_scale * w_scale)
    if mod.use_bias and mod.has_variable('params', 'bias'):
        y = y + mod.get_variable('params', 'bias').astype(jnp.float32)
    out_dtype = mod.dtype or jnp.promote_types(x.dtype, mod.param_dtype)
    return y.astype(out_dtype)


def ptq_apply(model, qvariables: Dict, *args, **kwargs):
    """``model.apply`` with quantized convs (needs ``quantize_convs`` output)."""
    with nn.intercept_methods(_serve_interceptor):
        return model.apply(qvariables, *args, **kwargs)


def make_ptq_predict_fn(model, qvariables: Dict,
                        **apply_kwargs) -> Callable:
    """Closure ``predict(x)`` for jit / tiled_inference / sharding."""
    def predict(x):
        return ptq_apply(model, qvariables, x, **apply_kwargs)
    return predict
