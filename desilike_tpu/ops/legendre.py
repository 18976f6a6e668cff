"""Legendre polynomials, mu-quadrature, and multipole projection.

Counterpart of the reference's ``utils.weights_mu`` + ``to_poles``
(utils.py weights_mu; theories/galaxy_clustering/base.py:193–208).
Projection onto multipoles is a single (nell, nmu) x (..., nmu) contraction —
an MXU-friendly matmul when batched.
"""

import numpy as np
import jax.numpy as jnp


def legendre(ell, x):
    """Legendre polynomial P_ell(x), jit-safe, via stable recurrence."""
    x = jnp.asarray(x)
    if ell == 0:
        return jnp.ones_like(x)
    if ell == 1:
        return x
    p0 = jnp.ones_like(x)
    p1 = x
    for n in range(1, ell):
        p0, p1 = p1, ((2 * n + 1) * x * p1 - n * p0) / (n + 1)
    return p1


def weights_mu(mu=20, method='leggauss'):
    """Return (mu nodes, weights) for integration over mu in [0, 1].

    method='leggauss': Gauss-Legendre (exact for polynomials), the
    reference default; 'trapz': trapezoidal on a uniform grid.
    Host-side (numpy) — grids are static.
    """
    if np.ndim(mu) == 1:
        mu = np.asarray(mu, dtype='f8')
        from numpy import trapezoid
        w = _trapz_weights(mu)
        return mu, w
    nmu = int(mu)
    if method == 'leggauss':
        x, w = np.polynomial.legendre.leggauss(nmu)
        mu = (x + 1.) / 2.
        w = w / 2.
    elif method == 'trapz':
        mu = np.linspace(0., 1., nmu)
        w = _trapz_weights(mu)
    else:
        raise ValueError('unknown mu-integration method {}'.format(method))
    return mu, w


def _trapz_weights(x):
    w = np.zeros_like(x)
    dx = np.diff(x)
    w[:-1] += dx / 2.
    w[1:] += dx / 2.
    return w


def multipole_weights(ells, mu, wmu):
    """(nell, nmu) projection weights: wmu * (2l+1) * P_l(mu).

    For pkmu symmetric in mu (integrated over [0,1]):
        P_l(k) = (2l+1) \\int_0^1 dmu P(k, mu) L_l(mu).
    """
    mu = np.asarray(mu, dtype='f8')
    wmu = np.asarray(wmu, dtype='f8')
    from numpy.polynomial import legendre as npleg
    rows = []
    for ell in ells:
        c = np.zeros(ell + 1)
        c[ell] = 1.
        rows.append(wmu * (2 * ell + 1) * npleg.legval(mu, c))
    return np.array(rows)


def to_poles(pkmu, weights):
    """Project pkmu (..., nk, nmu) onto multipoles -> (..., nell, nk).

    weights: (nell, nmu) from :func:`multipole_weights`.
    """
    return jnp.einsum('...km,lm->...lk', pkmu, jnp.asarray(weights, dtype=pkmu.dtype))


def trapz_weights(x):
    """Trapezoidal integration weights for arbitrary 1D grid (host-side)."""
    return _trapz_weights(np.asarray(x, dtype='f8'))
