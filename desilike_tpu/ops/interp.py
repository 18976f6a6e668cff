"""jit/vmap/grad-safe 1D interpolation.

Replaces the reference's interpax dependency (desilike/jax.py:211,258).
The cubic method is a local C1 cubic Hermite with non-uniform centered-
difference slopes (interpax 'cubic2'-style), which avoids a global spline
solve per evaluation — each query is O(1) gathers + fused arithmetic, ideal
for the AP-remap hot path where (k, mu) grids are re-interpolated every
likelihood call.
"""

import jax.numpy as jnp
import numpy as np


def _hermite_slopes(x, y):
    """Centered-difference slopes on a non-uniform grid; one-sided at ends.

    x: (n,), y: (..., n). Returns (..., n).
    """
    dx = x[1:] - x[:-1]                      # (n-1,)
    d = (y[..., 1:] - y[..., :-1]) / dx      # secants, (..., n-1)
    # Interior: weighted average giving exact derivative for quadratics
    w_lo = dx[1:] / (dx[:-1] + dx[1:])
    m_int = w_lo * d[..., :-1] + (1. - w_lo) * d[..., 1:]
    m0 = d[..., :1]
    mN = d[..., -1:]
    return jnp.concatenate([m0, m_int, mN], axis=-1)


def _find_interval(x, xqf, n):
    """Interval index for each query. For static uniform or log-uniform grids
    the index is computed arithmetically (O(1), no gather-heavy binary
    search — TPU-friendly); otherwise falls back to searchsorted."""
    try:
        xnp = np.asarray(x)
        is_static = True
    except Exception:
        is_static = False
    if is_static and xnp.size > 2:
        d = np.diff(xnp)
        if np.allclose(d, d[0], rtol=1e-8):
            step = (xnp[-1] - xnp[0]) / (xnp.size - 1)
            i = jnp.floor((xqf - xnp[0]) / step).astype(jnp.int32)
            return jnp.clip(i, 0, n - 2)
        if np.all(xnp > 0):
            ld = np.diff(np.log(xnp))
            if np.allclose(ld, ld[0], rtol=1e-8):
                step = (np.log(xnp[-1]) - np.log(xnp[0])) / (xnp.size - 1)
                i = jnp.floor((jnp.log(xqf) - np.log(xnp[0])) / step).astype(jnp.int32)
                return jnp.clip(i, 0, n - 2)
    return jnp.clip(jnp.searchsorted(x, xqf, side='right') - 1, 0, n - 2)


def interp1d(xq, x, y, method='cubic', extrap='clip'):
    """Interpolate y(x) at query points xq.

    Parameters
    ----------
    xq : array, any shape
        Query points.
    x : array (n,)
        Sample points, strictly increasing. May be static numpy or traced.
    y : array (..., n)
        Values; interpolation along the last axis; leading axes broadcast
        against the result (output shape = y.shape[:-1] + xq.shape).
    method : 'linear' or 'cubic'
    extrap : 'clip' (clamp queries to [x0, xn]) or 'linear' (extrapolate
        with edge slope) or True (use edge polynomial).

    Returns
    -------
    array of shape y.shape[:-1] + xq.shape
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    xq = jnp.asarray(xq)
    qshape = xq.shape
    xqf = xq.reshape(-1)
    if extrap == 'clip':
        xqf = jnp.clip(xqf, x[0], x[-1])
    n = x.shape[0]
    i = _find_interval(x, xqf, n)
    x0 = x[i]
    x1 = x[i + 1]
    h = x1 - x0
    t = (xqf - x0) / h

    if method == 'linear':
        y0 = y[..., i]
        y1 = y[..., i + 1]
        out = y0 + (y1 - y0) * t
    elif method == 'cubic':
        m = _hermite_slopes(x, y)
        y0 = y[..., i]
        y1 = y[..., i + 1]
        m0 = m[..., i] * h
        m1 = m[..., i + 1] * h
        t2 = t * t
        t3 = t2 * t
        h00 = 2 * t3 - 3 * t2 + 1
        h10 = t3 - 2 * t2 + t
        h01 = -2 * t3 + 3 * t2
        h11 = t3 - t2
        out = h00 * y0 + h10 * m0 + h01 * y1 + h11 * m1
    else:
        raise ValueError('unknown method {}'.format(method))
    return out.reshape(y.shape[:-1] + qshape)


def loglog_interp(kq, k, pk, method='cubic'):
    """Interpolate a positive power spectrum in log-log space.

    Standard in the reference's BAO hot path (bao.py:18 ``_interp``):
    cubic interpolation of pk as a function of log10 k. Note the reference
    interpolates pk linearly in amplitude vs log10(k); we do the same
    (not log pk, which would fail for negative pk differences).
    """
    return interp1d(jnp.log10(kq), jnp.log10(k), pk, method=method)


class Interpolator1D:
    """Static-grid interpolator with precomputed slopes; callable in jit.

    Use when the table (x, y) is fixed at initialize-time: slopes are
    precomputed once in float64 numpy.
    """

    def __init__(self, x, y, method='cubic', extrap='clip'):
        self.x = np.asarray(x, dtype='f8')
        self.y = np.asarray(y, dtype='f8')
        self.method = method
        self.extrap = extrap

    def __call__(self, xq):
        return interp1d(xq, self.x, self.y, method=self.method, extrap=self.extrap)
