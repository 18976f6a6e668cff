"""Chebyshev spectral tables: gather-free interpolation for TPU.

TPU has no fast gather: a (batch, nquery) dynamic table lookup costs ~40x
more than the equivalent elementwise math (measured on v5e: 33 ms vs 0.8 ms
for 4096 x 560 queries). Power-spectrum tables are smooth + oscillatory, so
instead of splines we fit a Chebyshev series once per evaluation (one static
matmul, MXU) and evaluate queries with the Clenshaw recurrence (pure fused
elementwise, VPU). Order ~100-200 captures BAO wiggles to ~1e-6 relative.

This replaces the reference's interpax cubic interpolation in the AP-remap
hot path (reference bao.py:18 ``_interp``).
"""

import numpy as np
import jax.numpy as jnp
from jax import lax


def _static_cubic_interp_matrix(xq, x):
    """(nq, nx) matrix: cubic Hermite interpolation weights from samples at x
    to query points xq (host-side float64; both static)."""
    x = np.asarray(x, dtype='f8')
    xq = np.asarray(xq, dtype='f8')
    nx = x.size
    M = np.zeros((xq.size, nx))
    # slopes as linear operator: m = D @ y
    D = np.zeros((nx, nx))
    dx = np.diff(x)
    for i in range(nx):
        if i == 0:
            D[0, 0] = -1. / dx[0]
            D[0, 1] = 1. / dx[0]
        elif i == nx - 1:
            D[-1, -2] = -1. / dx[-1]
            D[-1, -1] = 1. / dx[-1]
        else:
            w_lo = dx[i] / (dx[i - 1] + dx[i])
            # m_i = w_lo * d_{i-1} + (1-w_lo) * d_i
            D[i, i - 1] += -w_lo / dx[i - 1]
            D[i, i] += w_lo / dx[i - 1]
            D[i, i] += -(1 - w_lo) / dx[i]
            D[i, i + 1] += (1 - w_lo) / dx[i]
    idx = np.clip(np.searchsorted(x, xq, side='right') - 1, 0, nx - 2)
    xc = np.clip(xq, x[0], x[-1])
    h = x[idx + 1] - x[idx]
    t = (xc - x[idx]) / h
    h00 = 2 * t ** 3 - 3 * t ** 2 + 1
    h10 = t ** 3 - 2 * t ** 2 + t
    h01 = -2 * t ** 3 + 3 * t ** 2
    h11 = t ** 3 - t ** 2
    for q in range(xq.size):
        i = idx[q]
        M[q, i] += h00[q]
        M[q, i + 1] += h01[q]
        M[q] += (h10[q] * h[q]) * D[i]
        M[q] += (h11[q] * h[q]) * D[i + 1]
    return M


class ChebyshevLogInterp:
    """Chebyshev representation of a positive table y(k) on a static k grid.

    Fit: node values (static matmul from the table grid) -> ln -> Chebyshev
    coefficients (static DCT matrix). Evaluate: Clenshaw recurrence on
    x = normalized ln k, clipped to the domain.

    Parameters
    ----------
    k : array (nk,)
        Static table grid (the template's k).
    order : int or None
        Series order; default scales with the number of BAO periods in range.
    log_values : bool
        Fit ln(y) (requires y > 0); evaluation returns exp(series).
    """

    def __init__(self, k, order=None, log_values=True):
        k = np.asarray(k, dtype='f8')
        self.lo, self.hi = np.log(k[0]), np.log(k[-1])
        if order is None:
            periods = (k[-1] - k[0]) / 0.0633  # BAO wavelength 2 pi / rd
            order = int(min(320, max(96, 60 + 9 * periods)))
        self.order = int(order)
        self.log_values = bool(log_values)
        theta = (np.arange(self.order) + 0.5) * np.pi / self.order
        xc = np.cos(theta)[::-1]
        lnk_nodes = (xc + 1.) / 2. * (self.hi - self.lo) + self.lo
        self.k_nodes = np.exp(lnk_nodes)
        # static: table grid -> node values (cubic), then values -> coefficients
        A = _static_cubic_interp_matrix(lnk_nodes, np.log(k))    # (order, nk)
        C = 2. / self.order * np.cos(np.outer(np.arange(self.order), theta[::-1]))
        C[0] /= 2.
        self._A = A
        self._C = C

    def coeffs(self, values):
        """values (..., nk) on the table grid -> coefficients (..., order)."""
        values = jnp.asarray(values)
        A = jnp.asarray(self._A, dtype=values.dtype)
        nodes = jnp.einsum('on,...n->...o', A, values)
        if self.log_values:
            nodes = jnp.log(nodes)
        C = jnp.asarray(self._C, dtype=values.dtype)
        return jnp.einsum('co,...o->...c', C, nodes)

    def evaluate(self, coeffs, k):
        """coeffs (order,), k any shape -> y(k) via Clenshaw (gather-free)."""
        lnk = jnp.log(k)
        x = jnp.clip((lnk - self.lo) / (self.hi - self.lo) * 2. - 1., -1., 1.)
        two_x = 2. * x
        b1 = jnp.zeros_like(x)
        b2 = jnp.zeros_like(x)
        for j in range(self.order - 1, 0, -1):
            b1, b2 = two_x * b1 - b2 + coeffs[j], b1
        out = coeffs[0] + x * b1 - b2
        if self.log_values:
            out = jnp.exp(out)
        return out

    def evaluation_matrix(self, k):
        """Static (npts, order) design matrix T_j(x(k)) for FIXED evaluation
        points (host-side numpy): evaluation becomes ONE matmul
        (``evaluate_static``), which maps to the MXU — versus the Clenshaw
        recurrence whose order-long sequential chain is VPU-bound. Use for
        every static grid in a hot path (loop integrands, fixed quadratures)."""
        lnk = np.log(np.asarray(k, dtype='f8')).ravel()
        x = np.clip((lnk - self.lo) / (self.hi - self.lo) * 2. - 1., -1., 1.)
        theta = np.arccos(x)
        return np.cos(np.outer(theta, np.arange(self.order)))

    def evaluate_static(self, coeffs, matrix, precision=None):
        """coeffs (..., order), matrix from ``evaluation_matrix`` -> y at the
        matrix's (static) points."""
        coeffs = jnp.asarray(coeffs)
        out = jnp.einsum('pc,...c->...p', jnp.asarray(matrix, dtype=coeffs.dtype), coeffs,
                         precision=precision)
        if self.log_values:
            out = jnp.exp(out)
        return out

    def __call__(self, values, k):
        return self.evaluate(self.coeffs(values), k)
