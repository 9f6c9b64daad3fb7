"""Building-block ops (NHWC, flax.linen).

Parity target: ``ever/module/ops.py`` — ConvBlock/SeparableConvBlock with
same-padding, LayerNorm2d, PoolBlock, ResidualBlock, channel utilities.  Key
TPU-first differences:

- Layout is **NHWC** (TPU conv native; the reference is NCHW).
- ``Bf16compatible`` (``ops.py:152-166``) disappears: XLA resize/interpolate
  handles bf16; upsampling here is computed in fp32 and cast back only where
  numerically warranted, inside :func:`resize`.
- BatchNorm under ``jit`` + sharded batch is cross-replica by construction
  (the batch mean is a global mean — XLA inserts the collective), so SyncBN
  (``th_ddp_trainer.py:21-22``) needs no special module.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = [
    'ConvBlock', 'SeparableConvBlock', 'SeparableConv2d', 'DepthwiseConv2d',
    'LayerNorm2d', 'PoolBlock', 'ResidualBlock', 'ConvUpsampling', 'Norm',
    'resize', 'upsample', 'global_avg_pool', 'adaptive_avg_pool', 'max_pool',
    'avg_pool', 'channel_concat', 'channel_sum', 'list_index',
]


def channel_concat(features):
    """Concat a feature list on the channel dim (parity: ``ops.py:124-129``)."""
    if len(features) == 1:
        return features[0]
    return jnp.concatenate(features, axis=-1)


def channel_sum(features):
    """Sum a feature list (parity: ``ops.py:132-137``)."""
    return features[0] if len(features) == 1 else sum(features)


def list_index(features, *index):
    """Select features by index (parity: ``ListIndex``, ``ops.py:140-149``)."""
    if len(index) == 1:
        return features[index[0]]
    return [features[i] for i in index]

Dtype = Any


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _resize_align_corners(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """Bilinear resize with torch ``align_corners=True`` semantics.

    Separable 1-D interpolations expressed as two small dense matmuls
    (MXU-friendly; no gathers).  Used for exact parity with the reference's
    ``UpsamplingBilinear2d``; the default half-pixel path is faster and is
    what new configs should use.
    """
    n, h, w, c = x.shape
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    def interp_matrix(in_size, out_size):
        if in_size == 1:
            return jnp.ones((out_size, in_size), jnp.float32)
        if out_size == 1:
            # torch align_corners: scale = (in-1)*0/(out-1 -> 0) = index 0,
            # NOT an average of all input pixels
            return jnp.zeros((1, in_size), jnp.float32).at[0, 0].set(1.0)
        pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_size - 1)
        frac = pos - lo
        rows = jnp.arange(out_size)
        m = jnp.zeros((out_size, in_size), jnp.float32)
        m = m.at[rows, lo].add(1.0 - frac)
        m = m.at[rows, hi].add(frac)
        return m

    mh = interp_matrix(h, oh)                     # [oh, h]
    mw = interp_matrix(w, ow)                     # [ow, w]
    y = jnp.einsum('oh,nhwc->nowc', mh, xf)
    y = jnp.einsum('pw,nowc->nopc', mw, y)
    return y.astype(dtype)


def _upsample_nearest_int(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact nearest k× upsample as broadcast+reshape.

    Identical to ``jax.image.resize(method='nearest')`` for integer factors
    (src index floor((o+0.5)/k) == o//k) but avoids its gather — whose
    backward is a scatter-add that measured 0.5 ms/step in the FarSeg FPN;
    the broadcast's backward is a plain phase-sum reduce.
    """
    n, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, k, w, k, c))
    return y.reshape(n, h * k, w * k, c)


def resize(x: jnp.ndarray, scale: float = None, shape: Tuple[int, int] = None,
           method: str = 'nearest', align_corners: bool = False) -> jnp.ndarray:
    """Spatial resize of an NHWC tensor.

    Replaces ``F.interpolate`` + the bf16 workaround (``ever/module/fpn.py:96-102``,
    ``ops.py:152-166``): bilinear is computed in fp32 and cast back to the
    input dtype; nearest is dtype-agnostic.  ``align_corners=True`` matches
    torch ``UpsamplingBilinear2d`` exactly (needed when porting reference
    checkpoints); the default half-pixel convention is TPU-cheaper.  Integer
    nearest upscaling takes the exact broadcast fast path (see above).
    """
    n, h, w, c = x.shape
    if shape is None:
        shape = (int(h * scale), int(w * scale))
    out_shape = (n, shape[0], shape[1], c)
    kh, rh = divmod(shape[0], h)
    kw, rw = divmod(shape[1], w)
    int_k = kh if (rh == 0 and rw == 0 and kh == kw and kh > 1) else 0
    if method == 'nearest':
        if int_k:
            return _upsample_nearest_int(x, int_k)
        return jax.image.resize(x, out_shape, method='nearest')
    if align_corners:
        return _resize_align_corners(x, shape[0], shape[1])
    # NOTE: three bilinear fast paths were tried and REVERTED after
    # profiling on v5e: phase-decomposed interleave (+1.4 ms/step — strided
    # copies), an explicit einsum forward pair (+0.2 ms/step), and a
    # custom_vjp keeping jax.image's forward but backward as transposed
    # einsums (+0.12 ms/step).  jax.image.resize's own lowering (dot_general
    # pair, transpose+dot in reverse) is the fastest known on this hardware.
    if x.dtype == jnp.bfloat16:
        # XLA resize is bf16-native on TPU; upcasting doubles HBM traffic
        return jax.image.resize(x, out_shape, method=method)
    orig = x.dtype
    y = jax.image.resize(x.astype(jnp.float32), out_shape, method=method)
    return y.astype(orig)


def upsample(x: jnp.ndarray, scale: int = 2, method: str = 'nearest') -> jnp.ndarray:
    return resize(x, scale=scale, method=method)


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """``adaptive_avg_pool2d(x, 1)`` equivalent: NHWC → N11C (fp32 accumulate)."""
    y = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=keepdims)
    return y.astype(x.dtype)


def adaptive_avg_pool(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """Exact torch-style adaptive average pooling over NHWC.

    Bin i spans ``[floor(i*H/OH), ceil((i+1)*H/OH))`` (torch semantics).
    Implemented with an integral image + static boundary gathers, so uneven
    bins (e.g. 64→3) are exact and XLA-friendly.
    """
    oh, ow = _pair(output_size)
    n, h, w, c = x.shape
    if (oh, ow) == (1, 1):
        return global_avg_pool(x)
    if (oh, ow) == (h, w):
        return x
    ii = jnp.cumsum(jnp.cumsum(x.astype(jnp.float32), axis=1), axis=2)
    ii = jnp.pad(ii, ((0, 0), (1, 0), (1, 0), (0, 0)))
    import numpy as _np
    ys0 = (_np.arange(oh) * h) // oh
    ys1 = -((-(_np.arange(oh) + 1) * h) // oh)      # ceil((i+1)*h/oh)
    xs0 = (_np.arange(ow) * w) // ow
    xs1 = -((-(_np.arange(ow) + 1) * w) // ow)      # ceil((i+1)*w/ow)
    a = ii[:, ys1][:, :, xs1]
    b = ii[:, ys0][:, :, xs1]
    cc = ii[:, ys1][:, :, xs0]
    d = ii[:, ys0][:, :, xs0]
    areas = ((ys1 - ys0)[:, None] * (xs1 - xs0)[None, :]).astype(_np.float32)
    out = (a - b - cc + d) / jnp.asarray(areas)[None, :, :, None]
    return out.astype(x.dtype)


@jax.custom_vjp
def _max_pool_32(x):
    """3x3/2 SAME maxpool with an equality-based backward (EXPERIMENT — lost).

    XLA's default backward for ``reduce_window(max)`` is
    ``select_and_scatter`` (~0.54 ms for the ResNet stem pool, 256²x64 bf16
    batch 8, v5e).  This custom VJP routes ``g`` to every input position that
    EQUALS its window max via output-resolution parity-plane terms.

    MEASURED SLOWER: FarSeg-R50 step 33.7 → 36.8 ms.  The select_and_scatter
    it removes (-0.54 ms) is outweighed by the plane interleave copies
    (+0.81 ms ``copy``), un-fused maximum/compare/pad_slice fusions
    (+1.6 ms), and extra scan ``while`` overhead.  A first version using
    interior ``lax.pad`` scatters was far worse still (+20 ms/step — interior
    pads of hot tensors always materialize).  Kept opt-in
    (``max_pool(..., impl='planes')``) for the record; default stays
    ``reduce_window``.

    Semantics: identical values; gradients identical wherever the window max
    is unique (a.e. for float inputs).  At an exact tie the reference picks
    one winner; this sends ``g`` to each tied position.
    """
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))


def _max_pool_32_fwd(x):
    out = _max_pool_32(x)
    return out, (x, out)


def _max_pool_32_bwd(res, g):
    # Parity-plane formulation: every term lives at OUTPUT resolution
    # (elementwise compare/select/add — VPU work XLA fuses), and the four
    # (even/odd row, even/odd col) planes interleave back to input
    # resolution with one reshape-transpose.  An earlier version scattered
    # each term with interior ``lax.pad``; those pads materialized
    # (+20 ms/step at 256²x64 b8) — never interior-pad hot tensors.
    x, out = res
    n, h, w, c = x.shape
    oh, ow = out.shape[1], out.shape[2]
    neg = jnp.finfo(x.dtype).min
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    zero = jnp.zeros((), g.dtype)

    def m(dy, dx, sy, sx):
        """(v_{dy,dx} == out) * g, shifted by (sy, sx) output cells."""
        v = jax.lax.slice(xp, (0, dy, dx, 0),
                          (n, dy + 2 * oh - 1, dx + 2 * ow - 1, c),
                          (1, 2, 2, 1))
        t = jnp.where(v == out, g, zero)
        if sy or sx:
            t = t[:, sy:, sx:, :]
            t = jnp.pad(t, ((0, 0), (0, sy), (0, sx), (0, 0)))
        return t

    # input (2i+py, 2j+px) receives window (oy=i+1-dy//... ) terms:
    # py=0 -> dy=1; py=1 -> dy∈{0 (from oy=i+1), 2 (from oy=i)}; same for px
    p00 = m(1, 1, 0, 0)
    p01 = m(1, 0, 0, 1) + m(1, 2, 0, 0)
    p10 = m(0, 1, 1, 0) + m(2, 1, 0, 0)
    p11 = m(0, 0, 1, 1) + m(0, 2, 1, 0) + m(2, 0, 0, 1) + m(2, 2, 0, 0)
    # interleave planes: [n,oh,ow,c] x4 -> [n,oh,2,ow,2,c] -> [n,h,w,c]
    rows0 = jnp.stack([p00, p01], axis=3)      # [n,oh,ow,2,c]
    rows1 = jnp.stack([p10, p11], axis=3)
    grad = jnp.stack([rows0, rows1], axis=2)   # [n,oh,2,ow,2,c]
    return (grad.reshape(n, h, w, c).astype(x.dtype),)


_max_pool_32.defvjp(_max_pool_32_fwd, _max_pool_32_bwd)


@jax.custom_vjp
def _max_pool_32_p(x):
    """3x3/2 SAME maxpool; backward = one-pass Pallas kernel
    (``ever_tpu/ops/pool.py`` — same equality tie semantics as 'planes')."""
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))


def _max_pool_32_p_fwd(x):
    out = _max_pool_32_p(x)
    return out, (x, out)


def _max_pool_32_p_bwd(res, g):
    from ever_tpu.ops.pool import max_pool_32_pallas
    x, out = res
    dev = jax.devices()[0]
    # tunneled TPU plugins report platform 'axon' (CLAUDE.md gotcha; same
    # check as ops/attention.py)
    interpret = not (dev.platform == 'tpu' or 'tpu' in dev.device_kind.lower())
    return (max_pool_32_pallas(x, out, g, interpret=interpret),)


_max_pool_32_p.defvjp(_max_pool_32_p_fwd, _max_pool_32_p_bwd)


def max_pool(x, window=3, stride=2, padding='SAME', impl='reduce_window'):
    w, s = _pair(window), _pair(stride)
    # NOTE: lax 'SAME' pads (0, 1) for window 3 / stride 2 — NOT the
    # torch-style symmetric ((1,1),(1,1)) the custom impls implement, so
    # the string never routes to them (the ResNet stem passes explicit
    # symmetric padding, ``resnet.py`` stem call site)
    if (impl in ('planes', 'pallas')
            and w == (3, 3) and s == (2, 2)
            and padding == ((1, 1), (1, 1))
            and x.ndim == 4 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and jnp.issubdtype(x.dtype, jnp.floating)):
        return _max_pool_32_p(x) if impl == 'pallas' else _max_pool_32(x)
    if impl == 'separable' and x.ndim == 4:
        # max over a 2-D window factorizes into two 1-D maxes; the backward
        # becomes two 1-D select_and_scatters instead of one 2-D (an MFU
        # experiment for the 0.54 ms stem maxpool backward)
        pad = padding if isinstance(padding, str) else tuple(padding)
        y = nn.max_pool(x, window_shape=(w[0], 1), strides=(s[0], 1),
                        padding=pad if isinstance(pad, str)
                        else (pad[0], (0, 0)))
        return nn.max_pool(y, window_shape=(1, w[1]), strides=(1, s[1]),
                           padding=pad if isinstance(pad, str)
                           else ((0, 0), pad[1]))
    return nn.max_pool(x, window_shape=w, strides=s, padding=padding)


def avg_pool(x, window=3, stride=2, padding='SAME'):
    w, s = _pair(window), _pair(stride)
    return nn.avg_pool(x, window_shape=w, strides=s, padding=padding)


class Norm(nn.Module):
    """Pluggable normalization: ``'bn' | 'gn' | 'ln' | None``.

    BatchNorm matches torch defaults (momentum 0.1 → flax momentum 0.9,
    eps 1e-5).  ``train`` toggles ``use_running_average``; ``frozen=True``
    pins running stats regardless (parity: BN freezing trick,
    ``ever/module/resnet.py:155-160,227-234``).
    """

    kind: Optional[str] = 'bn'
    groups: int = 32
    dtype: Dtype = jnp.float32
    frozen: bool = False
    eps: float = 1e-5    # bn only; EfficientNet uses the TF default 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind is None:
            return x
        if self.kind == 'bn':
            return nn.BatchNorm(
                use_running_average=(not train) or self.frozen,
                momentum=0.9, epsilon=self.eps, dtype=self.dtype)(x)
        if self.kind == 'gn':
            c = x.shape[-1]
            g = min(self.groups, c)
            while c % g != 0:       # GroupNorm needs groups | channels
                g -= 1
            return nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=self.dtype)(x)
        if self.kind == 'ln':
            return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        raise ValueError(f'unknown norm kind: {self.kind!r}')


class LayerNorm2d(nn.Module):
    """Channel LayerNorm on NHWC (parity: ``ever/module/ops.py:10-22``; in
    NHWC this is just LayerNorm over the trailing dim)."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype)(x)


class ConvBlock(nn.Module):
    """conv → [norm] → [act] with SAME padding (parity: ``ops.py:45-66``)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = False
    norm: Optional[str] = 'bn'
    act: Optional[Callable] = nn.relu
    bn_frozen: bool = False
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        init_kw = {} if self.kernel_init is None else {'kernel_init': self.kernel_init}
        x = nn.Conv(self.features, _pair(self.kernel_size), strides=_pair(self.stride),
                    kernel_dilation=_pair(self.dilation), padding='SAME',
                    feature_group_count=self.groups, use_bias=self.use_bias,
                    dtype=self.dtype, **init_kw)(x)
        x = Norm(self.norm, dtype=self.dtype, frozen=self.bn_frozen)(x, train)
        if self.act is not None:
            x = self.act(x)
        return x


class DepthwiseConv2d(nn.Module):
    """Depthwise conv (parity: ``ops.py:25-30``)."""

    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return nn.Conv(c, _pair(self.kernel_size), strides=_pair(self.stride),
                       kernel_dilation=_pair(self.dilation), padding='SAME',
                       feature_group_count=c, use_bias=self.use_bias,
                       dtype=self.dtype)(x)


class SeparableConv2d(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (parity: ``ops.py:33-42``)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = DepthwiseConv2d(self.kernel_size, self.stride, self.dilation,
                            use_bias=False, dtype=self.dtype)(x)
        x = nn.Conv(self.features, (1, 1), use_bias=self.use_bias, dtype=self.dtype)(x)
        return x


class SeparableConvBlock(nn.Module):
    """separable conv → [norm] → [act] (parity: ``ops.py:69-86``)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    norm: Optional[str] = 'bn'
    act: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SeparableConv2d(self.features, self.kernel_size, self.stride,
                            self.dilation, use_bias=False, dtype=self.dtype)(x)
        x = Norm(self.norm, dtype=self.dtype)(x, train)
        if self.act is not None:
            x = self.act(x)
        return x


class PoolBlock(nn.Module):
    """Adaptive pool → 1x1 conv-norm-relu → bilinear upsample back to the
    input size (parity: ``ops.py:89-100``; PSP-style pyramid bin)."""

    output_size: int = 1
    features: int = 256
    norm: Optional[str] = 'bn'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, _ = x.shape
        y = adaptive_avg_pool(x, self.output_size)
        y = ConvBlock(self.features, 1, norm=self.norm, dtype=self.dtype)(y, train)
        if y.shape[1] == 1 and y.shape[2] == 1:
            return jnp.broadcast_to(y, (n, h, w, self.features))
        return resize(y, shape=(h, w), method='bilinear')


class ResidualBlock(nn.Module):
    """Two 3x3 conv-norm-relu with identity shortcut (parity: ``ops.py:103-118``)."""

    features: int
    norm: Optional[str] = 'bn'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBlock(self.features, 3, norm=self.norm, dtype=self.dtype)(x, train)
        y = ConvBlock(self.features, 3, norm=self.norm, act=None, dtype=self.dtype)(y, train)
        # NO post-add activation: the reference ResidualBlock returns
        # seq(x) + identity bare (``ops.py:103-112``)
        return y + identity


class ConvUpsampling(nn.Module):
    """conv → upsample (parity: ``ops.py:169-183``)."""

    features: int
    scale: int = 2
    kernel_size: int = 3
    method: str = 'bilinear'
    align_corners: bool = True    # reference: nn.UpsamplingBilinear2d
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.features, self.kernel_size, norm=None, act=None,
                      use_bias=True, dtype=self.dtype)(x, train)
        return resize(x, scale=self.scale, method=self.method,
                      align_corners=(self.align_corners
                                     and self.method == 'bilinear'))


# -- reference module spellings (ops.py:114-190) ------------------------------
# The functional forms above are the idiomatic JAX surface; these linen
# wrappers keep configs written against the reference's nn.Module spellings
# working unchanged.

class ChannelReduction(nn.Module):
    """Per-scale 1x1 conv+BN channel projection (parity: ``ops.py:114-121``)."""

    out_channels: int
    norm: Optional[str] = 'bn'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = False):
        return [ConvBlock(self.out_channels, 1, norm=self.norm, act=None,
                          dtype=self.dtype, name=f'reduce{i}')(f, train)
                for i, f in enumerate(features)]


class ChannelConcat(nn.Module):
    """Module spelling of :func:`channel_concat` (parity: ``ops.py:124-129``)."""

    def __call__(self, features):
        assert isinstance(features, (list, tuple))
        return channel_concat(list(features))


class Sum(nn.Module):
    """Module spelling of :func:`channel_sum` (parity: ``ops.py:132-137``)."""

    def __call__(self, features):
        assert isinstance(features, (list, tuple))
        return channel_sum(list(features))


class ListIndex(nn.Module):
    """Module spelling of :func:`list_index` (parity: ``ops.py:140-149``)."""

    index: Tuple[int, ...] = (0,)

    def __call__(self, features):
        return list_index(features, *self.index)


class Squeeze(nn.Module):
    """Squeeze one axis (parity: ``ops.py:184-190``)."""

    dim: int = -1

    def __call__(self, x):
        return jnp.squeeze(x, axis=self.dim)


class Bf16compatible(nn.Module):
    """Run a submodule in fp32 under bf16 compute (parity: ``ops.py:152-166``).

    Rarely needed on TPU — XLA's resize/normalize lower fine in bf16 and the
    framework keeps params fp32 — but the escape hatch mirrors the reference
    for numerically-delicate heads.
    """

    inner: nn.Module

    def __call__(self, x, *args, **kwargs):
        dtype = x.dtype
        if dtype == jnp.bfloat16:
            x = x.astype(jnp.float32)
        y = self.inner(x, *args, **kwargs)
        if dtype == jnp.bfloat16:
            y = jax.tree.map(lambda t: t.astype(dtype), y)
        return y


__all__ += ['ChannelReduction', 'ChannelConcat', 'Sum', 'ListIndex',
            'Squeeze', 'Bf16compatible']
