"""Pallas TPU kernels (optional paths).

Measured finding (v5e, batch 4096 x 640 queries, order 122): a hand-written
Pallas Clenshaw kernel exactly ties the XLA-fused unrolled elementwise chain
(1.423 ms vs 1.423 ms) — XLA already fuses the recurrence into one
VPU-resident loop, so the default hot path stays plain jnp
(ops/chebyshev.py). This kernel is kept as the validated reference
implementation for when a future fusion (e.g. Clenshaw + AP remap + Legendre
projection in one VMEM pass) is worth hand-scheduling.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except ImportError:  # pragma: no cover
    HAS_PALLAS = False


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def clenshaw_pallas(x, coeffs, log_values=True, interpret=False):
    """Batched Chebyshev evaluation via a Pallas kernel.

    x : (B, Q) normalized queries in [-1, 1]
    coeffs : (B, order) per-row Chebyshev coefficients
    Returns (B, Q) series values (exp'd if log_values).
    """
    B, Q = x.shape
    order = coeffs.shape[-1]
    order_pad = _round_up(order, 128)
    q_pad = _round_up(Q, 128)
    b_pad = _round_up(B, 8)
    xp = jnp.pad(x, ((0, b_pad - B), (0, q_pad - Q)))
    cp = jnp.pad(coeffs, ((0, b_pad - B), (0, order_pad - order)))

    def kernel(x_ref, c_ref, o_ref):
        xb = x_ref[:]
        two_x = 2. * xb
        b1 = jnp.zeros_like(xb)
        b2 = jnp.zeros_like(xb)
        for j in range(order - 1, 0, -1):
            cj = c_ref[:, j][:, None]
            b1, b2 = two_x * b1 - b2 + cj, b1
        out = c_ref[:, 0][:, None] + xb * b1 - b2
        if log_values:
            out = jnp.exp(out)
        o_ref[:] = out

    out = pl.pallas_call(
        kernel,
        grid=(b_pad // 8,),
        in_specs=[pl.BlockSpec((8, q_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, order_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, q_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, q_pad), x.dtype),
        interpret=interpret,
    )(xp, cp)
    return out[:B, :Q]
