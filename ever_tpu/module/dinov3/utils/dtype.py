"""Path-parity module: ``ever.module.dinov3.utils.dtype`` (reference
``dinov3/utils/dtype.py``)."""

import jax.numpy as jnp

_NAMES = {
    'float32': jnp.float32, 'fp32': jnp.float32,
    'float16': jnp.float16, 'fp16': jnp.float16,
    'bfloat16': jnp.bfloat16, 'bf16': jnp.bfloat16,
    'float64': jnp.float64, 'int8': jnp.int8, 'int32': jnp.int32,
    'float8_e4m3fn': jnp.float8_e4m3fn, 'float8_e5m2': jnp.float8_e5m2,
}


def as_torch_dtype(name):
    """Reference spelling: dtype-from-string.  Returns the JAX dtype (the
    framework's native dtype object)."""
    if not isinstance(name, str):
        return jnp.dtype(name)
    key = name.replace('torch.', '')
    if key in _NAMES:
        return _NAMES[key]
    return jnp.dtype(key)


as_jax_dtype = as_torch_dtype

__all__ = ['as_torch_dtype', 'as_jax_dtype']
