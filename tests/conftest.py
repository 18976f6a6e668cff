"""Test configuration: force CPU with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh, per SURVEY.md §4)."""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'  # tests are the CPU tier (bench runs on TPU)
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize force-registers the axon TPU platform; the env
# var alone does not stick, so pin the platform through the config API too.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


def pytest_configure(config):
    config.addinivalue_line('markers', 'slow: multi-process / long-running tests')
