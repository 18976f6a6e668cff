import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.special import spherical_jn
from scipy.interpolate import CubicSpline

from desilike_tpu.ops.fftlog import PowerToCorrelation, CorrelationToPower
from desilike_tpu.ops.interp import interp1d
from desilike_tpu.ops.legendre import weights_mu, multipole_weights, to_poles, legendre
from desilike_tpu.ops.linalg import chi2, whiten_factor, blockinv


def test_fftlog_gaussian_analytic():
    # P(k) = e^{-k^2}: xi_0(s) = sqrt(pi)/4 e^{-s^2/4} / (2 pi^2)
    k = np.geomspace(1e-4, 1e2, 1024)
    p2c = PowerToCorrelation(k, ells=(0,))
    s, xi = p2c(np.exp(-k ** 2))
    truth = np.sqrt(np.pi) / 4 * np.exp(-s[0] ** 2 / 4) / (2 * np.pi ** 2)
    mask = (s[0] > 0.05) & (s[0] < 10)
    err = np.max(np.abs(np.asarray(xi[0])[mask] - truth[mask])) / np.max(np.abs(truth))
    assert err < 2e-4


def test_fftlog_vs_bruteforce():
    k = np.geomspace(1e-4, 1e2, 2048)
    q = k / 0.15
    T = np.log(1 + 2.34 * q) / (2.34 * q) * (1 + 3.89 * q + (16.1 * q) ** 2 + (5.46 * q) ** 3 + (6.71 * q) ** 4) ** -0.25
    pk = 2e4 * k ** 0.96 * T ** 2
    p2c = PowerToCorrelation(k, ells=(0, 2, 4))
    s, xi = p2c(np.array([pk, 0.5 * pk, 0.1 * pk]))
    kd = np.geomspace(1e-4, 20, 100000)
    pkd = np.interp(kd, k, pk)
    damp = np.exp(-(kd / 10.) ** 2)
    svals = np.array([20., 50., 100., 150.])
    for ill, ell in enumerate((0, 2, 4)):
        amp = [1, 0.5, 0.1][ill]
        brute = np.array([np.trapezoid(kd ** 3 * amp * pkd * damp * spherical_jn(ell, sv * kd), np.log(kd))
                          for sv in svals]) * (-1) ** (ell // 2) / (2 * np.pi ** 2)
        mine = np.interp(svals, s[ill], np.asarray(xi[ill]))
        assert np.max(np.abs(mine - brute) / np.max(np.abs(brute))) < 1e-3


def test_fftlog_roundtrip():
    k = np.geomspace(1e-4, 1e2, 1024)
    pk = 1e4 * k / (1. + (k / 0.1) ** 3)
    p2c = PowerToCorrelation(k, ells=(0,))
    s, xi = p2c(pk)
    c2p = CorrelationToPower(s[0], ells=(0,))
    k2, pk2 = c2p(np.asarray(xi))
    mask = (k2[0] > 1e-2) & (k2[0] < 1.)
    recon = np.asarray(pk2[0])[mask]
    orig = np.interp(k2[0][mask], k, pk)
    assert np.max(np.abs(recon - orig) / np.max(orig)) < 1e-3


def test_interp_cubic_vs_scipy():
    x = np.linspace(0, 10, 50)
    y = np.sin(x) + 0.1 * x
    xq = np.linspace(0.2, 9.8, 137)
    mine = np.asarray(interp1d(xq, x, y, method='cubic'))
    ref = CubicSpline(x, y)(xq)
    assert np.max(np.abs(mine - ref)) < 2e-3  # local cubic vs global spline


def test_interp_grad():
    x = np.linspace(0, 1, 20)

    def f(a):
        y = a * jnp.asarray(x) ** 2
        return jnp.sum(interp1d(jnp.array([0.5]), x, y, method='cubic'))

    g = jax.grad(f)(2.0)
    assert abs(float(g) - 0.25) < 1e-3


def test_multipole_projection_orthonormal():
    mu, wmu = weights_mu(20)
    W = multipole_weights((0, 2, 4), mu, wmu)
    # project P_l(mu) onto multipoles: identity for even l
    for ill, ell in enumerate((0, 2, 4)):
        pkmu = np.broadcast_to(np.asarray(legendre(ell, jnp.asarray(mu))), (5, 20))
        poles = np.asarray(to_poles(jnp.asarray(pkmu), W))
        expected = np.zeros(3)
        expected[ill] = 1.
        np.testing.assert_allclose(poles[:, 0][..., None].T * 0 + poles.T, np.tile(expected, (5, 1)), atol=1e-5)


def test_chi2_whitening():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(6, 6))
    cov = A @ A.T + 6 * np.eye(6)
    d = rng.normal(size=6)
    L = whiten_factor(cov)
    c1 = float(chi2(jnp.asarray(d), jnp.asarray(np.linalg.inv(cov))))
    w = L @ d
    assert abs(c1 - w @ w) < 1e-4 * abs(c1)


def test_blockinv():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(7, 7))
    M = A @ A.T + 7 * np.eye(7)
    blocks = [[M[:3, :3], M[:3, 3:]], [M[3:, :3], M[3:, 3:]]]
    inv = blockinv(blocks)
    np.testing.assert_allclose(inv, np.linalg.inv(M), rtol=1e-8, atol=1e-10)


def test_pallas_clenshaw_interpret():
    """Pallas Clenshaw kernel (interpret mode on CPU) matches plain jnp."""
    from desilike_tpu.ops.pallas_kernels import clenshaw_pallas, HAS_PALLAS
    if not HAS_PALLAS:
        pytest.skip('pallas unavailable')
    rng = np.random.default_rng(0)
    B, Q, order = 16, 37, 50
    x = jnp.asarray(rng.uniform(-1, 1, (B, Q)).astype('f4'))
    coeffs = jnp.asarray((rng.normal(size=(B, order)) * 0.1 / (1 + np.arange(order)) ** 1.5).astype('f4'))
    got = np.asarray(clenshaw_pallas(x, coeffs, log_values=False, interpret=True))
    # reference evaluation
    two_x = 2 * np.asarray(x)
    b1 = np.zeros_like(x)
    b2 = np.zeros_like(x)
    c = np.asarray(coeffs)
    for j in range(order - 1, 0, -1):
        b1, b2 = two_x * b1 - b2 + c[:, j][:, None], b1
    expected = c[:, 0][:, None] + np.asarray(x) * b1 - b2
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
