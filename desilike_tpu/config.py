"""Global configuration for desilike_tpu.

TPU-first defaults: float32 compute (native MXU/VPU dtype), optional float64
mode for CPU validation runs (reference desilike enables jax x64 globally,
see /root/reference/desilike/jax.py:18 — here f64 is opt-in because TPUs
emulate f64 in software).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

_DTYPE = jnp.float32

# Matmul precision: the TPU default lowers f32 matmuls to single-pass bf16,
# which injects O(0.1) noise into the log-posterior and silently collapses
# gradient-sampler step-size adaptation (measured on the flagship config:
# ChEES dual averaging drove eps -> 0, GR ~ 3000). The 'high' tier (multi-
# pass bf16, ~f32-equivalent) removes it at ~4% throughput cost vs ~24% for
# 'highest' (865.7k vs 902.7k vs 684.5k evals/s on-chip). Override with
# DESILIKE_TPU_MATMUL_PRECISION=default|high|highest.
jax.config.update('jax_default_matmul_precision',
                  os.environ.get('DESILIKE_TPU_MATMUL_PRECISION', 'high'))


def set_dtype(dtype):
    """Set the global compute dtype ('float32' or 'float64').

    'float64' also enables jax x64 mode; call before building pipelines.
    """
    global _DTYPE
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64:
        jax.config.update('jax_enable_x64', True)
    _DTYPE = jnp.float64 if dtype == jnp.float64 else jnp.float32


def get_dtype():
    """Return the global compute dtype."""
    return _DTYPE


def asarray(x):
    """Convert to a JAX array with the global compute dtype (float inputs only)."""
    return jnp.asarray(x, dtype=_DTYPE)


def nparray(x):
    """Convert to a float64 numpy array (host-side precomputation precision)."""
    return np.asarray(x, dtype='f8')


import contextlib


@contextlib.contextmanager
def host_eval():
    """Run eager (initialization-time) JAX computation on the host CPU.

    Under a tunneled/remote TPU platform every eager op is a remote dispatch;
    init-time work (fiducial tables, data-vector generation, constant design
    matrices) is latency-bound there, so pin it to the CPU backend.
    """
    try:
        cpu = jax.devices('cpu')[0]
    except RuntimeError:
        yield
        return
    with jax.default_device(cpu):
        yield


if os.environ.get('DESILIKE_TPU_X64', '') in ('1', 'true', 'True'):
    set_dtype('float64')


def loop_matmul_precision():
    """Matmul precision for PT-loop integral products (EPT/TNS quadratic
    forms and the loop design-matrix landing of the linear pk on the loop
    grids). These feed only the 1-loop CORRECTIONS (~10% of the model):
    measured on-chip, single-pass bf16 here moves the final multipoles by
    3e-4 median / 3e-3 max — the same level as the FFTLog decomposition's
    own validated tolerance vs the quadrature engine — while recovering
    the full MXU fast path (EPT 333k vs 258k evals/s under uniform
    'high'); the LINEAR-term rows always stay at the global precision.
    Override with DESILIKE_TPU_LOOP_MATMUL_PRECISION=high|highest."""
    return os.environ.get('DESILIKE_TPU_LOOP_MATMUL_PRECISION', 'default')
