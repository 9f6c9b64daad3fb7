"""DINOv3-style Vision Transformer (NHWC patches, flax.linen, bf16-ready).

Parity target: ``ever/module/dinov3/`` (~2,100 LoC vendored from Meta):
``DinoVisionTransformer`` (``models/vision_transformer.py:70-340``) with axial
RoPE (``layers/rope_position_encoding.py:16-121``: period parametrization +
train-time shift/jitter/rescale coordinate augmentation), storage/register
tokens, LayerScale, SwiGLU FFN, stochastic depth, ``get_intermediate_layers``
for dense features, size ladder vit_small→vit_7b and the satellite-pretrained
configs ``vitl16_sat493m`` / ``vit7b16_sat493m``
(``vision_transformer.py:343-476``).

TPU-native notes:
- attention uses ``jax.nn.dot_product_attention`` (XLA fuses to an MXU
  flash-style kernel; a Pallas kernel slots in via ``attn_impl``);
- stochastic depth is a per-sample mask (the reference's batch-subset
  ``index_add`` trick, ``layers/block.py:84-198``, is a CUDA memory
  optimization that XLA's fusion makes unnecessary);
- fp8 / 2:4-sparse linear (``layers/fp8_linear.py``, ``sparse_linear.py``)
  are GPU-specific (``torch._scaled_mm`` / cuSPARSELt); the TPU path uses
  bf16 matmuls (int8 quantization can be added via Pallas stochastic-round
  kernels when needed).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ever_tpu.core import registry
from ever_tpu.interface.module import ERModule

__all__ = ['DinoVisionTransformer', 'ViTEncoder', 'VIT_SPECS', 'RMSNorm',
           'rope_apply']

Dtype = Any


# -- RoPE --------------------------------------------------------------------

def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def rope_apply(x, sin, cos):
    """Rotate token features by the axial position angles ([N, D] sin/cos)."""
    return x * cos + _rotate_half(x) * sin


class RopePositionEmbedding(nn.Module):
    """Axial RoPE with learned-buffer periods and train-time coordinate
    augmentation (parity: ``rope_position_encoding.py:16-121``)."""

    embed_dim: int
    num_heads: int
    base: Optional[float] = 100.0
    min_period: Optional[float] = None
    max_period: Optional[float] = None
    normalize_coords: str = 'separate'
    shift_coords: Optional[float] = None
    jitter_coords: Optional[float] = None
    rescale_coords: Optional[float] = None

    def _periods(self) -> jnp.ndarray:
        d_head = self.embed_dim // self.num_heads
        n = d_head // 4
        if self.base is not None:
            return self.base ** (2 * jnp.arange(n, dtype=jnp.float32) / (d_head // 2))
        base = self.max_period / self.min_period
        periods = base ** jnp.linspace(0, 1, n)
        return periods / base * self.max_period

    @nn.compact
    def __call__(self, H: int, W: int, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.embed_dim % (4 * self.num_heads) != 0:
            raise ValueError('embed_dim must be divisible by 4*num_heads for axial RoPE')
        # static function of config — computed inline (the reference keeps a
        # persistent buffer only for torch teacher/student state_dict copies)
        periods = self._periods()

        if self.normalize_coords == 'max':
            denom_h = denom_w = max(H, W)
        elif self.normalize_coords == 'min':
            denom_h = denom_w = min(H, W)
        elif self.normalize_coords == 'separate':
            denom_h, denom_w = H, W
        else:
            raise ValueError(f'Unknown normalize_coords: {self.normalize_coords}')
        ch = (jnp.arange(H, dtype=jnp.float32) + 0.5) / denom_h
        cw = (jnp.arange(W, dtype=jnp.float32) + 0.5) / denom_w
        coords = jnp.stack(jnp.meshgrid(ch, cw, indexing='ij'), axis=-1)
        coords = coords.reshape(H * W, 2) * 2.0 - 1.0

        if train and (self.shift_coords or self.jitter_coords or self.rescale_coords):
            key = self.make_rng('dropout')
            k1, k2, k3 = jax.random.split(key, 3)
            if self.shift_coords is not None:
                shift = jax.random.uniform(k1, (2,), minval=-self.shift_coords,
                                           maxval=self.shift_coords)
                coords = coords + shift[None, :]
            if self.jitter_coords is not None:
                jmax = math.log(self.jitter_coords)
                jitter = jnp.exp(jax.random.uniform(k2, (2,), minval=-jmax, maxval=jmax))
                coords = coords * jitter[None, :]
            if self.rescale_coords is not None:
                rmax = math.log(self.rescale_coords)
                rescale = jnp.exp(jax.random.uniform(k3, (1,), minval=-rmax, maxval=rmax))
                coords = coords * rescale

        angles = 2 * math.pi * coords[:, :, None] / periods[None, None, :]
        angles = angles.reshape(H * W, -1)
        angles = jnp.tile(angles, (1, 2))
        return jnp.sin(angles), jnp.cos(angles)


# -- norms / ffn / misc layers ----------------------------------------------

class RMSNorm(nn.Module):
    """Root-mean-square norm (parity: ``layers/rms_norm.py:10-24``;
    the reference default eps is 1e-5)."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        y = x32 * jax.lax.rsqrt(jnp.mean(x32 ** 2, axis=-1, keepdims=True) + self.epsilon)
        return (y * scale).astype(x.dtype)


class LayerScale(nn.Module):
    """Learned per-channel residual scaling (parity: ``layers/layer_scale.py``)."""

    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param('gamma',
                           nn.initializers.constant(self.init_value),
                           (x.shape[-1],))
        return x * gamma.astype(x.dtype)


def drop_path(x, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Per-sample stochastic depth."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name='fc1')(x)
        x = nn.gelu(x)
        return nn.Dense(self.out, dtype=self.dtype, name='fc2')(x)


class SwiGLUFFN(nn.Module):
    """SwiGLU feed-forward (parity: ``layers/ffn_layers.py:52-77``).

    ``hidden`` is the nominal MLP width ``int(dim * ffn_ratio)``; the actual
    gate width is ``int(hidden * 2/3)`` rounded up to ``align_to`` (the
    reference's ``swiglu``/``swiglu32``/``swiglu64``/``swiglu128`` ladder,
    ``ffn_layers.py:67-68`` + ``vision_transformer.py:34-40``).  The two
    input projections (``w1``/``w2`` in torch) are fused into one ``w12``
    matmul — one MXU call instead of two; the torch→flax converter
    concatenates the pretrained kernels accordingly.
    """

    hidden: int
    out: int
    align_to: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = int(self.hidden * 2 / 3)
        gate = d + (-d % self.align_to)
        x12 = nn.Dense(2 * gate, dtype=self.dtype, name='w12')(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(self.out, dtype=self.dtype, name='w3')(nn.silu(x1) * x2)


# -- attention ----------------------------------------------------------------

class SelfAttention(nn.Module):
    """Fused-QKV multi-head attention with optional RoPE on the patch tokens
    (parity: ``layers/attention.py:43-118``; prefix tokens — cls + storage —
    skip the rotation)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    proj_bias: bool = True
    attn_impl: Optional[str] = None     # None=auto | 'xla' | 'flash' | 'fused' | 'fused' (Pallas)
    # 'bnhd' (flax convention) or 'bhnd': q/k/v produced directly in the TPU
    # kernels' native [B,H,N,D] via ONE fused transpose of the packed qkv
    # tensor instead of 3 swapaxes in + 1 out around the kernel — the
    # transpose-traffic experiment for the dense 1024² regime (VERDICT r3
    # #3; measured on chip, docs/PERFORMANCE.md "ViT-L/16 training").
    attn_layout: str = 'bnhd'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 n_valid: Optional[int] = None):
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name='qkv')(x)
        qkv = qkv.reshape(b, n, 3, h, d)
        if self.attn_layout == 'bhnd':
            qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))        # [3, B, H, N, D]
            q, k, v = qkv[0], qkv[1], qkv[2]
        else:
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, D]
        if rope is not None:
            sin, cos = rope                                   # [HW, D_head]
            # with stack-level padding (n_valid) the layout is
            # [prefix | HW patches | tail pads]; identity rows cover both
            # the prefix AND the tail so the whole tensor rotates at once
            prefix = (n_valid if n_valid is not None else n) - sin.shape[0]
            tail = n - (n_valid if n_valid is not None else n)
            if tail:
                sin = jnp.concatenate(
                    [sin, jnp.zeros((tail, sin.shape[1]), sin.dtype)], 0)
                cos = jnp.concatenate(
                    [cos, jnp.ones((tail, cos.shape[1]), cos.dtype)], 0)
            if prefix:
                # prefix tokens (cls + storage) skip the rotation.  A
                # (sin=0, cos=1) prefix row makes rope_apply the exact
                # identity there (x*1 + rotate_half(x)*0), so the whole
                # tensor rotates in ONE fused elementwise op instead of
                # slice + rotate + concat per layer.
                sin = jnp.concatenate(
                    [jnp.zeros((prefix, sin.shape[1]), sin.dtype), sin], 0)
                cos = jnp.concatenate(
                    [jnp.ones((prefix, cos.shape[1]), cos.dtype), cos], 0)
            # Rotation happens in the compute dtype, DOWNSTREAM: the
            # full-length [N, D] tables go to ops.attention, which rotates
            # IN-KERNEL on the fused path (the VMEM-resident q block / K
            # rows — removes the ~10 ms/step rotate materialization the r5
            # profile attributed to slice_negate fusions) and with a plain
            # elementwise pass on the xla/flash paths.  The reference's
            # pos_embed_rope_dtype defaults to fp32 — forcing f32 rotation
            # cost ~40 ms/step of HBM traffic at ViT-L 512² (r3), while
            # fp32 models are bit-identical either way.
            rope2d = (sin.astype(q.dtype), cos.astype(q.dtype))
        else:
            rope2d = None
        from ever_tpu.ops.attention import attention
        out = attention(q, k, v, impl=self.attn_impl, layout=self.attn_layout,
                        n_valid=n_valid, rope=rope2d)
        if self.attn_layout == 'bhnd':
            out = jnp.transpose(out, (0, 2, 1, 3))            # → [B, N, H, D]
        out = out.reshape(b, n, c)
        out = nn.Dense(c, use_bias=self.proj_bias, dtype=self.dtype,
                       name='proj')(out)
        return out



def _make_layer_norm(eps, dtype, name):
    """nn.LayerNorm or the fused Pallas LayerNorm (ops/norm.py).

    The fused module is param-compatible (scale/bias, fp32) and falls back
    to plain flax math off-TPU.  Default OFF: the chip A/B measured the
    Pallas LN 5.3 ms/step SLOWER at ViT-L 512² (211.5 vs 206.2) — XLA's
    "slow-looking" LN fusions carry neighboring elementwise work (residual
    adds, casts) that the kernel boundary forces back to HBM
    (docs/PERFORMANCE.md 'fused LayerNorm').  EVER_FUSED_LN=1 re-enables
    for future A/Bs."""
    import os
    if os.environ.get('EVER_FUSED_LN', '0') == '1':
        from ever_tpu.ops.norm import FusedLayerNorm
        return FusedLayerNorm(epsilon=eps, dtype=dtype, name=name)
    return nn.LayerNorm(epsilon=eps, dtype=dtype, name=name)

class SelfAttentionBlock(nn.Module):
    """Pre-norm attention + FFN block with LayerScale and stochastic depth
    (parity: ``layers/block.py:84-198``)."""

    dim: int
    num_heads: int
    ffn_ratio: float = 4.0
    qkv_bias: bool = False
    # None = no LayerScale (the reference constructor default; SAT/dinov3
    # checkpoint factories pass 1e-5 explicitly)
    layerscale_init: Optional[float] = None
    drop_path_rate: float = 0.0
    ffn_layer: str = 'mlp'            # 'mlp' | 'swiglu' | 'swiglu{32,64,128}'
    norm: str = 'ln'                  # 'ln' | 'rms'
    norm_eps: float = 1e-6            # 1e-5 = reference 'layernormbf16'
    attn_impl: Optional[str] = None   # None=auto | 'xla' | 'flash' | 'fused'
    attn_layout: str = 'bnhd'         # 'bnhd' | 'bhnd' (see SelfAttention)
    dtype: Dtype = jnp.float32

    def _norm(self, name):
        if self.norm == 'rms':
            return RMSNorm(epsilon=self.norm_eps, dtype=self.dtype, name=name)
        return _make_layer_norm(self.norm_eps, self.dtype, name)

    @nn.compact
    def __call__(self, x, rope=None, train: bool = False,
                 n_valid: Optional[int] = None):
        hidden = int(self.dim * self.ffn_ratio)
        y = self._norm('norm1')(x)
        y = SelfAttention(self.dim, self.num_heads, self.qkv_bias,
                          attn_impl=self.attn_impl,
                          attn_layout=self.attn_layout,
                          dtype=self.dtype, name='attn')(y, rope, n_valid)
        if self.layerscale_init is not None:
            y = LayerScale(self.layerscale_init, name='ls1')(y)
        if self.drop_path_rate > 0:
            y = drop_path(y, self.drop_path_rate, not train,
                          self.make_rng('dropout') if train else None)
        x = x + y

        y = self._norm('norm2')(x)
        if self.ffn_layer.startswith('swiglu'):
            align = int(self.ffn_layer[len('swiglu'):] or 8)
            y = SwiGLUFFN(hidden, self.dim, align_to=align,
                          dtype=self.dtype, name='mlp')(y)
        else:
            y = Mlp(hidden, self.dim, dtype=self.dtype, name='mlp')(y)
        if self.layerscale_init is not None:
            y = LayerScale(self.layerscale_init, name='ls2')(y)
        if self.drop_path_rate > 0:
            y = drop_path(y, self.drop_path_rate, not train,
                          self.make_rng('dropout') if train else None)
        return x + y


class PatchEmbed(nn.Module):
    """Conv patchifier (parity: ``layers/patch_embed.py:21-87``)."""

    embed_dim: int
    patch_size: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding='VALID',
                    dtype=self.dtype, name='proj')(x)
        n, h, w, c = x.shape
        return x.reshape(n, h * w, c), (h, w)


# -- the transformer ----------------------------------------------------------

# name → (depth, embed_dim, heads, ffn_ratio, ffn_layer)
VIT_SPECS = {
    'vit_small': (12, 384, 6, 4.0, 'mlp'),
    'vit_base': (12, 768, 12, 4.0, 'mlp'),
    'vit_large': (24, 1024, 16, 4.0, 'mlp'),
    'vit_so400m': (27, 1152, 18, 3.7777778, 'swiglu'),
    'vit_huge2': (32, 1280, 20, 4.0, 'swiglu'),
    'vit_giant2': (40, 1536, 24, 4.0, 'swiglu'),
    'vit_7b': (40, 4096, 32, 3.0, 'swiglu'),
}


class DinoVisionTransformer(nn.Module):
    """ViT trunk (parity: ``models/vision_transformer.py:70-340``).

    ``__call__`` returns a dict with ``x_norm_clstoken``,
    ``x_storage_tokens``, ``x_norm_patchtokens`` and the patch grid shape.
    """

    vit_type: str = 'vit_large'
    patch_size: int = 16
    n_storage_tokens: int = 4
    layerscale_init: Optional[float] = None
    drop_path_rate: float = 0.0
    qkv_bias: bool = True
    ffn_layer: Optional[str] = None   # override VIT_SPECS (e.g. 'swiglu64')
    # None -> per-norm reference default: 1e-6 for 'ln', 1e-5 for 'rms'
    norm_eps: Optional[float] = None
    pos_embed_rope_base: float = 100.0
    pos_embed_rope_normalize_coords: str = 'separate'
    pos_embed_rope_shift_coords: Optional[float] = None
    pos_embed_rope_jitter_coords: Optional[float] = None
    pos_embed_rope_rescale_coords: Optional[float] = None
    pos_embed_rope_min_period: Optional[float] = None
    pos_embed_rope_max_period: Optional[float] = None
    norm: str = 'ln'
    untie_cls_and_patch_norms: bool = False
    # training-only: a separate cls/storage norm for LOCAL crops (index >= 1
    # of a multi-crop list forward) — reference vision_transformer.py:249-254
    untie_global_and_local_cls_norm: bool = False
    attn_impl: Optional[str] = None   # None=auto | 'xla' | 'flash' | 'fused'
    attn_layout: str = 'bnhd'         # 'bnhd' | 'bhnd' (see SelfAttention)
    # Stack-level token padding: pad the token sequence ONCE after patch
    # embed to the fused kernel's 128-aligned length and carry the pad rows
    # through every block, instead of pad+slice around each kernel call
    # (4 pads + 3 slices per layer ≈ 12 ms/step at ViT-L 1024²).  Pad KEYS
    # are masked out of every softmax (`n_valid` threads into the kernels);
    # pad QUERY rows compute garbage that row-wise ops keep isolated and
    # the head's patch slice discards, and their upstream gradient is
    # structurally zero, so dk/dv stay clean.  None = auto: on TPU, in the
    # fused-dispatch token range, when the pad ratio is ≤5% (1024² tiles:
    # 4101→4224 = +3% rows; 512²'s 1029→1152 = +12% would cost more in the
    # linears than the pads cost around the kernels).
    pad_tokens: Optional[bool] = None
    # Per-block activation rematerialisation (the TPU analog of the
    # reference's per-stage ``with_cp`` gradient checkpointing,
    # ``ever/module/resnet.py:189-208``): None = off, 'full' = recompute
    # everything in the backward, 'dots' = jax.checkpoint with
    # dots_with_no_batch_dims_saveable (keeps matmul outputs — cheaper
    # recompute, still drops the big attention/FFN intermediates).
    remat: Optional[str] = None       # None | 'full' | 'dots'
    dtype: Dtype = jnp.float32

    def setup(self):
        depth, dim, heads, ffn_ratio, ffn_layer = VIT_SPECS[self.vit_type]
        self.embed_dim = dim
        self.num_heads = heads
        self.depth = depth
        self.patch_embed = PatchEmbed(dim, self.patch_size, dtype=self.dtype)
        self.cls_token = self.param('cls_token',
                                    nn.initializers.normal(0.02), (1, 1, dim))
        if self.n_storage_tokens > 0:
            self.storage_tokens = self.param(
                'storage_tokens', nn.initializers.normal(0.02),
                (1, self.n_storage_tokens, dim))
        self.rope_embed = RopePositionEmbedding(
            embed_dim=dim, num_heads=heads,
            base=None if self.pos_embed_rope_min_period else self.pos_embed_rope_base,
            min_period=self.pos_embed_rope_min_period,
            max_period=self.pos_embed_rope_max_period,
            normalize_coords=self.pos_embed_rope_normalize_coords,
            shift_coords=self.pos_embed_rope_shift_coords,
            jitter_coords=self.pos_embed_rope_jitter_coords,
            rescale_coords=self.pos_embed_rope_rescale_coords)
        # UNIFORM stochastic depth: the reference passes the same
        # drop_path_rate to every block (vision_transformer.py:154-168) —
        # no per-depth linear ramp
        eps = self.resolved_norm_eps
        block_cls = SelfAttentionBlock
        if self.remat:
            # `train` (argnum 3, self = 0) is a Python bool branching on
            # drop_path — must stay static under jax.checkpoint
            policy = None
            if self.remat == 'dots':
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif self.remat not in (True, 'full'):
                raise ValueError(f"remat must be None, 'full' or 'dots', "
                                 f'got {self.remat!r}')
            # argnums 3/4 (train, n_valid) are Python-level — static
            block_cls = nn.remat(SelfAttentionBlock, static_argnums=(3, 4),
                                 policy=policy)
        self.blocks = [block_cls(
            dim, heads, ffn_ratio, qkv_bias=self.qkv_bias,
            layerscale_init=self.layerscale_init,
            drop_path_rate=self.drop_path_rate,
            ffn_layer=self.ffn_layer or ffn_layer, norm=self.norm,
            norm_eps=eps, attn_impl=self.attn_impl,
            attn_layout=self.attn_layout, dtype=self.dtype,
            name=f'block{i}') for i in range(depth)]

        def make_norm(name):
            if self.norm == 'rms':
                return RMSNorm(epsilon=eps, dtype=self.dtype, name=name)
            return _make_layer_norm(eps, self.dtype, name)

        self.final_norm = make_norm('norm')
        if self.untie_cls_and_patch_norms:
            self.cls_norm = make_norm('cls_norm')
        if self.untie_global_and_local_cls_norm:
            self.local_cls_norm = make_norm('local_cls_norm')

    @property
    def resolved_norm_eps(self) -> float:
        """norm_eps=None resolves to the per-norm reference default —
        exposed for code that rebuilds blocks from trunk attrs
        (``parallel/pp.py``)."""
        if self.norm_eps is not None:
            return self.norm_eps
        return 1e-5 if self.norm == 'rms' else 1e-6

    def _tokens(self, x):
        n = x.shape[0]
        tokens, (h, w) = self.patch_embed(x.astype(self.dtype))
        prefix = [jnp.broadcast_to(self.cls_token, (n, 1, self.embed_dim))]
        if self.n_storage_tokens > 0:
            prefix.append(jnp.broadcast_to(
                self.storage_tokens, (n, self.n_storage_tokens, self.embed_dim)))
        tokens = jnp.concatenate(prefix + [tokens], axis=1).astype(self.dtype)
        return tokens, (h, w)

    def _stack_pad(self, tokens):
        """Apply stack-level token padding (see ``pad_tokens``); returns
        ``(tokens, n_valid)`` where ``n_valid=None`` means unpadded."""
        from ever_tpu.ops.attention import (FLASH_TOKEN_THRESHOLD,
                                            FUSED_TOKEN_THRESHOLD, _on_tpu,
                                            pad_target)
        n = tokens.shape[1]
        # shared with the kernel pad so the stack target always equals the
        # length the fused kernel would pad to (no second pad inside)
        target = pad_target(n)
        if target == n:
            return tokens, None
        use = self.pad_tokens
        if use is None:
            use = (_on_tpu() and self.attn_impl in (None, 'fused')
                   and FUSED_TOKEN_THRESHOLD <= n <= FLASH_TOKEN_THRESHOLD
                   and (target - n) / n <= 0.05)
        if not use:
            return tokens, None
        return jnp.pad(tokens, ((0, 0), (0, target - n), (0, 0))), n

    def forward_features(self, x, train: bool = False, local_crop: bool = False):
        tokens, (h, w) = self._tokens(x)
        tokens, n_valid = self._stack_pad(tokens)
        # the reference recomputes rope INSIDE the block loop
        # (vision_transformer.py:239-244): in training each block sees
        # freshly-sampled shift/jitter/rescale coordinate augmentations.
        # At eval (or with no augs configured) the embedding is
        # deterministic — hoist it out of the loop
        augs_on = train and any(r is not None for r in (
            self.pos_embed_rope_shift_coords, self.pos_embed_rope_jitter_coords,
            self.pos_embed_rope_rescale_coords))
        rope = None if augs_on else self.rope_embed(h, w, train)
        for blk in self.blocks:
            tokens = blk(tokens, self.rope_embed(h, w, train)
                         if augs_on else rope, train, n_valid)
        n_prefix = 1 + self.n_storage_tokens
        if (self.untie_global_and_local_cls_norm or
                self.untie_cls_and_patch_norms):
            if self.untie_global_and_local_cls_norm and train and local_crop:
                cls_and_storage = self.local_cls_norm(tokens[:, :n_prefix])
            elif self.untie_cls_and_patch_norms:
                cls_and_storage = self.cls_norm(tokens[:, :n_prefix])
            else:
                cls_and_storage = self.final_norm(tokens[:, :n_prefix])
            patches = self.final_norm(tokens[:, n_prefix:n_prefix + h * w])
        else:
            normed = self.final_norm(tokens)
            cls_and_storage = normed[:, :n_prefix]
            patches = normed[:, n_prefix:n_prefix + h * w]
        return dict(
            x_norm_clstoken=cls_and_storage[:, 0],
            x_storage_tokens=cls_and_storage[:, 1:],
            x_norm_patchtokens=patches,
            grid=(h, w),
        )

    def get_intermediate_layers(self, x, n: Union[int, Sequence[int]] = 1,
                                reshape: bool = False, return_class_token: bool = False,
                                norm: bool = True, train: bool = False):
        """Dense multi-level features (parity: ``vision_transformer.py:296-333``)."""
        tokens, (h, w) = self._tokens(x)
        tokens, n_valid = self._stack_pad(tokens)
        augs_on = train and any(r is not None for r in (
            self.pos_embed_rope_shift_coords, self.pos_embed_rope_jitter_coords,
            self.pos_embed_rope_rescale_coords))
        rope = None if augs_on else self.rope_embed(h, w, train)
        idxs = (set(range(self.depth - n, self.depth)) if isinstance(n, int)
                else set(i % self.depth for i in n))
        outs = []
        for i, blk in enumerate(self.blocks):
            tokens = blk(tokens, self.rope_embed(h, w, train)
                         if augs_on else rope, train, n_valid)
            if i in idxs:
                outs.append(tokens)
        n_prefix = 1 + self.n_storage_tokens
        results = []
        for t in outs:
            if norm:
                # untied models norm cls/storage with cls_norm
                # (reference vision_transformer.py:310-315)
                if self.untie_cls_and_patch_norms:
                    t = jnp.concatenate(
                        [self.cls_norm(t[:, :n_prefix]),
                         self.final_norm(t[:, n_prefix:])], axis=1)
                else:
                    t = self.final_norm(t)
            patches = t[:, n_prefix:n_prefix + h * w]
            if reshape:
                b = patches.shape[0]
                patches = patches.reshape(b, h, w, self.embed_dim)
            if return_class_token:
                results.append((patches, t[:, 0]))
            else:
                results.append(patches)
        return results

    def __call__(self, x, train: bool = False):
        # multi-crop list forward (parity: ``vision_transformer.py:233-272``):
        # resolutions differ per crop → separate traces, shared params
        if isinstance(x, (list, tuple)):
            # reference applies local_cls_norm to index 1 EXACTLY ('assume
            # second entry of list corresponds to local crops',
            # vision_transformer.py:249-254)
            return [self.forward_features(xi, train, local_crop=(i == 1))
                    for i, xi in enumerate(x)]
        return self.forward_features(x, train)


def cat_keep_shapes(x_list):
    """Flatten a list of [B, N_i, D] token tensors into one [ΣBN_i, D] with
    restore info (parity: ``dinov3/utils/utils.py:19-76``; lets one Dense
    call serve variable-resolution multi-crop lists)."""
    shapes = [x.shape for x in x_list]
    num_tokens = [int(jnp.prod(jnp.asarray(s[:-1]))) for s in shapes]
    flat = jnp.concatenate([x.reshape(-1, x.shape[-1]) for x in x_list], axis=0)
    return flat, shapes, num_tokens


def uncat_with_shapes(flat, shapes, num_tokens):
    """Inverse of :func:`cat_keep_shapes`."""
    outs = []
    offset = 0
    for s, n in zip(shapes, num_tokens):
        outs.append(flat[offset:offset + n].reshape(*s[:-1], flat.shape[-1]))
        offset += n
    return outs


class DINOHead(nn.Module):
    """DINO projection head: MLP → L2-normalised bottleneck → prototypes
    (parity: ``dinov3/layers/dino_head.py:11-66``)."""

    out_dim: int = 65536
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers - 1):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f'mlp{i}')(x)
            x = nn.gelu(x)
        x = nn.Dense(self.bottleneck_dim, dtype=self.dtype,
                     name=f'mlp{self.n_layers - 1}')(x)
        x = x / jnp.maximum(jnp.linalg.norm(x.astype(jnp.float32),
                                            axis=-1, keepdims=True), 1e-6).astype(x.dtype)
        # weight-normalised prototype layer (direction-only weights)
        w = self.param('prototypes', nn.initializers.normal(0.02),
                       (self.bottleneck_dim, self.out_dim))
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-6)
        return x @ w.astype(x.dtype)


# satellite-pretrained configurations (parity: ``vision_transformer.py:430-476``;
# both use norm_layer='layernormbf16' = LayerNorm eps 1e-5, rope rescale 2,
# mask_k_bias — the converter bakes the masked K bias into the qkv bias)
SAT_CONFIGS = {
    'vitl16_sat493m': dict(vit_type='vit_large', patch_size=16,
                           n_storage_tokens=4, layerscale_init=1e-5,
                           qkv_bias=True, norm_eps=1e-5,
                           pos_embed_rope_rescale_coords=2.0),
    # drop_path 0.4 + the local-crop cls norm are the reference 7b factory
    # defaults (vision_transformer.py:454-476)
    'vit7b16_sat493m': dict(vit_type='vit_7b', patch_size=16,
                            n_storage_tokens=4, layerscale_init=1e-5,
                            qkv_bias=False, ffn_layer='swiglu64', norm_eps=1e-5,
                            drop_path_rate=0.4,
                            untie_global_and_local_cls_norm=True,
                            pos_embed_rope_rescale_coords=2.0),
}

for _name, _spec in VIT_SPECS.items():
    registry.MODEL.register(
        _name, (lambda n: lambda **kw: DinoVisionTransformer(vit_type=n, **kw))(_name))
for _name, _cfg in SAT_CONFIGS.items():
    registry.MODEL.register(
        _name, (lambda c: lambda **kw: DinoVisionTransformer(**{**c, **kw}))(_cfg))


@registry.MODEL.register()
class ViTEncoder(ERModule):
    """Multi-scale encoder adapter over the ViT trunk.

    Returns pyramid features for FPN-style heads by tapping intermediate
    layers (evenly spaced quarters of depth) and resizing the os16 patch grid
    to os4/os8/os16/os32 (the standard ViT-adapter recipe for dense
    prediction heads).
    """

    def set_default_config(self):
        self.config.update(dict(
            vit_type='vit_large',
            patch_size=16,
            n_storage_tokens=4,
            drop_path_rate=0.0,
            out_indices=None,         # default: evenly spaced quarters
            pyramid=True,             # resize taps to os4/8/16/32
            attn_impl=None,           # None=auto | 'xla' | 'flash' | 'fused'
            remat=None,               # None | 'full' | 'dots' (per block)
            dtype='float32',
        ))

    def setup(self):
        self.vit = DinoVisionTransformer(
            vit_type=self.config.vit_type,
            patch_size=self.config.patch_size,
            n_storage_tokens=self.config.n_storage_tokens,
            drop_path_rate=self.config.drop_path_rate,
            attn_impl=self.config.attn_impl,
            remat=self.config.get('remat', None),
            dtype=jnp.dtype(self.config.dtype),
        )

    def __call__(self, x, train: bool = False):
        depth = VIT_SPECS[self.config.vit_type][0]
        out_indices = self.config.out_indices or \
            [depth // 4 - 1, depth // 2 - 1, 3 * depth // 4 - 1, depth - 1]
        taps = self.vit.get_intermediate_layers(
            x, n=out_indices, reshape=True, train=train)
        if not self.config.pyramid:
            return taps
        from ever_tpu.module.ops import resize
        scales = (4.0, 2.0, 1.0, 0.5)  # os16 grid → os4/os8/os16/os32
        if len(taps) != len(scales):
            raise ValueError(
                f'pyramid=True expects exactly {len(scales)} out_indices '
                f'(os4/os8/os16/os32 levels), got {len(taps)} '
                f'({out_indices}); set pyramid=False for a flat tap list')
        return [resize(t, scale=s, method='bilinear') if s != 1.0 else t
                for t, s in zip(taps, scales)]


@registry.MODEL.register()
class DinoSeg(ERModule):
    """DINOv3 dense segmentation fine-tune: ViT trunk + light decoder + loss.

    The transformer flagship training model (the CNN one is ``FarSeg``).
    The trunk is the full DINOv3 ViT (parity:
    ``ever/module/dinov3/models/vision_transformer.py:70-340``; the sat493m
    geometries ``:430-476``); dense features come from
    ``get_intermediate_layers`` (``:296-333``), the reference's dense
    prediction protocol.  The head is deliberately light (1x1 convs on the
    patch grid + bilinear upsample) so the train step's FLOPs — and hence
    the benchmarked MFU — are the trunk's.

    Training contract: ``__call__(x, y, train=True)`` → loss dict with
    ``cls_loss``; eval: softmax probabilities at input resolution.
    """

    def set_default_config(self):
        self.config.update(dict(
            backbone=dict(
                name='vitl16_sat493m',   # SAT_CONFIGS key or VIT_SPECS key
                drop_path_rate=0.0,
                attn_impl=None,          # None=auto | 'xla' | 'flash' | 'fused'
                remat=None,              # None | 'full' | 'dots' (per block)
            ),
            classes=7,
            head=dict(
                hidden=0,       # 0 = linear probe; >0 adds one hidden 1x1
                n_taps=1,       # last-n intermediate layers, concatenated
            ),
            loss=dict(ignore_index=255, ce=dict(), dice=None),
            dtype='float32',
        ))

    def setup(self):
        bcfg = dict(self.config.backbone)
        name = bcfg.pop('name', 'vitl16_sat493m')
        # `pretrained` follows the ResNetEncoder convention: a config key
        # consumed OUTSIDE the module (weight_io converts the .pth, the
        # launcher overlays via set_pretrained_state) — never a flax field
        bcfg.pop('pretrained', None)
        kwargs = dict(SAT_CONFIGS.get(name, {}))
        if not kwargs:
            if name not in VIT_SPECS:
                raise ValueError(f'unknown ViT backbone {name!r}; expected '
                                 f'one of {sorted(VIT_SPECS)} or '
                                 f'{sorted(SAT_CONFIGS)}')
            kwargs['vit_type'] = name
        kwargs.update(bcfg)              # user keys override the preset
        kwargs['dtype'] = jnp.dtype(self.config.dtype)
        self.vit = DinoVisionTransformer(**kwargs)

    @nn.compact
    def __call__(self, x, y: Optional[jnp.ndarray] = None, train: bool = False):
        dtype = jnp.dtype(self.config.dtype)
        n_taps = int(self.config.head.get('n_taps', 1))
        taps = self.vit.get_intermediate_layers(
            x.astype(dtype), n=n_taps, reshape=True, train=train)
        feat = taps[0] if n_taps == 1 else jnp.concatenate(taps, axis=-1)
        hidden = int(self.config.head.get('hidden', 0))
        if hidden:
            feat = nn.gelu(nn.Dense(hidden, dtype=dtype, name='head_hidden')(feat))
        logits = nn.Dense(int(self.config.classes), dtype=dtype,
                          name='head_classifier')(feat)
        from ever_tpu.module.ops import resize
        scale = x.shape[1] / logits.shape[1]
        logits = resize(logits, scale=scale, method='bilinear').astype(jnp.float32)
        if train and y is not None:
            from ever_tpu.module import loss as L
            lcfg = self.config.loss
            ignore = int(lcfg.get('ignore_index', 255))
            out = dict(cls_loss=L.softmax_ce_loss_with_logits(
                logits, y, ignore_index=ignore))
            if lcfg.get('dice'):
                out['dice_loss'] = L.dice_loss_with_logits(
                    logits, y, ignore_index=ignore, **dict(lcfg.dice))
            return out
        return nn.softmax(logits, axis=-1)


# ---------------------------------------------------------------------------
# Causal (text-decoder) attention family + reference layer helpers
# (``dinov3/layers/attention.py:30-166``, ``block.py:215-270``,
# ``ffn_layers.py:14-21``, ``patch_embed.py:14-18``,
# ``vision_transformer.py:55-65``).  These exist in the reference for
# DINOv3's text alignment; causal masking is a flag on
# ``jax.nn.dot_product_attention`` (fused on TPU by XLA).

def make_2tuple(x):
    """Parity: ``layers/patch_embed.py:14-18``."""
    if isinstance(x, tuple):
        assert len(x) == 2
        return x
    return (x, x)


def init_weights_vit(key=None):
    """Trunc-normal(0.02) kernel / zero bias initializer pair (parity:
    ``models/vision_transformer.py:55-65``, flax spelling: pass as
    ``kernel_init``/``bias_init``)."""
    return (nn.initializers.truncated_normal(stddev=0.02),
            nn.initializers.zeros)


class ListForwardMixin:
    """Run a token module over a list of [B, N_i, C] tensors as ONE batched
    call (parity: ``layers/ffn_layers.py:14-21``).  On TPU this keeps the
    MXU fed: one matmul over the concatenated tokens instead of list-many."""

    def forward_list(self, x_list):
        flat, shapes, num_tokens = cat_keep_shapes(x_list)
        out = self(flat)
        return uncat_with_shapes(out, shapes, num_tokens)


class LinearKMaskedBias(nn.Module):
    """Fused-QKV Dense whose bias is multiplied by a persisted 0/1 mask
    zeroing the K third (parity: ``layers/attention.py:30-40`` — a K bias is
    redundant because softmax(q·(k+b)) shifts every logit equally).  The mask
    lives in the ``constants`` collection so checkpoint surgery can override
    it like the reference's ``bias_mask`` buffer."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.features % 3 == 0
        y = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                     name='linear')(x)
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        third = self.features // 3
        default = jnp.concatenate([jnp.ones((third,)), jnp.zeros((third,)),
                                   jnp.ones((third,))])
        mask = self.variable('constants', 'bias_mask', lambda: default)
        return y + (bias * mask.value).astype(y.dtype)


class CausalSelfAttention(nn.Module):
    """Parity: ``layers/attention.py:121-166``."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    proj_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, is_causal: bool = True):
        b, n, c = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name='qkv')(x).reshape(b, n, 3, h, c // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = jax.nn.dot_product_attention(q, k, v, is_causal=is_causal)
        out = out.reshape(b, n, c)
        return nn.Dense(c, use_bias=self.proj_bias, dtype=self.dtype,
                        name='proj')(out)


class CausalSelfAttentionBlock(nn.Module):
    """Parity: ``layers/block.py:215-270``."""

    dim: int
    num_heads: int
    ffn_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    is_causal: bool = True
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         name='attention_norm')(x)
        y = CausalSelfAttention(self.dim, self.num_heads, dtype=self.dtype,
                                name='attention')(y, self.is_causal)
        if self.ls_init_value:
            y = LayerScale(self.ls_init_value, name='ls1')(y)
        x = x + y
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         name='ffn_norm')(x)
        y = Mlp(int(self.dim * self.ffn_ratio), self.dim, dtype=self.dtype,
                name='feed_forward')(y)
        if self.ls_init_value:
            y = LayerScale(self.ls_init_value, name='ls2')(y)
        return x + y


__all__ += ['make_2tuple', 'init_weights_vit', 'ListForwardMixin',
            'LinearKMaskedBias', 'CausalSelfAttention',
            'CausalSelfAttentionBlock']
