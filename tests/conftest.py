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
