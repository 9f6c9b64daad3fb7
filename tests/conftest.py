"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is JAX's standard fake-multi-device mechanism — real ``pjit``/``psum``
semantics without TPU hardware (SURVEY.md §4).  Must run before jax imports.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # force: the session env pins the TPU tunnel
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_TRACEBACK_FILTERING', 'off')

# persistent compilation cache: repeat test runs skip XLA recompiles
import jax  # noqa: E402

# something in the image pins jax_platforms='axon,cpu' at import time,
# overriding the env var — force CPU explicitly or tests run over the TPU tunnel
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_test_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
