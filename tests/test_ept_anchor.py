"""External anchor for the 1-loop SPT integrals (round-1 review item 6).

The framework's two engines (OneLoopIntegrals quadrature and FFTLogOneLoop)
share kernel code, so agreement between them cannot catch a common sign
error. This test implements P22_dd and P13_dd INDEPENDENTLY from the
literature formulas (Makino, Sasaki & Suto 1992; Jeong & Komatsu 2006,
eqs. 20-21) with scipy quadrature in float64, and pins the framework
against them on the realistic linear pk."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy import integrate

from desilike_tpu.ops.spt import OneLoopIntegrals
from desilike_tpu.cosmology import background as bg, linear


@pytest.fixture(scope='module')
def pk_pair():
    p = bg.resolve()
    ktab = np.geomspace(1e-5, 100., 1200)
    pktab = np.asarray(linear.pk_lin(p, jnp.asarray(ktab), 0.8), dtype='f8')
    lk, lp = np.log(ktab), np.log(pktab)

    def pk_np(q):
        q = np.asarray(q, dtype='f8')
        v = np.exp(np.interp(np.log(np.maximum(q, 1e-300)), lk, lp))
        return v * ((q > 5e-5) & (q < 1e2))

    lkj = jnp.asarray(lk)
    pkj = jnp.asarray(pktab)

    def pk_jx(q):
        v = jnp.interp(jnp.log(q), lkj, pkj)
        return v * ((q > 5e-5) & (q < 1e2))
    return pk_np, pk_jx


def p22_dd_literature(k, pk):
    """P22(k) = k^3/(98 (2 pi)^2) int dr P(kr) int dx P(k y)
    (3r + 7x - 10 r x^2)^2 / y^4, y^2 = 1 + r^2 - 2 r x
    (Jeong & Komatsu 2006 eq. 20)."""
    def inner(r):
        def f(x):
            y2 = 1. + r * r - 2. * r * x
            if y2 <= 1e-12:
                return 0.
            return pk(k * np.sqrt(y2)) * (3. * r + 7. * x - 10. * r * x * x) ** 2 / y2 ** 2
        val, _ = integrate.quad(f, -1., 1., limit=200)
        return pk(k * r) * val
    outer, _ = integrate.quad(inner, 1e-5 / k, 1e2 / k, limit=400)
    return k ** 3 / (98. * (2. * np.pi) ** 2) * outer


def p13_dd_literature(k, pk):
    """P13(k) = k^3 P(k)/(252 (2 pi)^2) int dr P(kr) [12/r^2 - 158 + 100 r^2
    - 42 r^4 + 3/r^3 (r^2 - 1)^3 (7 r^2 + 2) ln|(1+r)/(1-r)|]
    (Jeong & Komatsu 2006 eq. 21; Makino et al. 1992)."""
    def f(r):
        if abs(r - 1.) < 1e-8:
            bracket = 12. / r ** 2 - 158. + 100. * r ** 2 - 42. * r ** 4
        else:
            bracket = (12. / r ** 2 - 158. + 100. * r ** 2 - 42. * r ** 4
                       + 3. / r ** 3 * (r * r - 1.) ** 3 * (7. * r * r + 2.)
                       * np.log(abs((1. + r) / (1. - r))))
        return pk(k * r) * bracket
    val, _ = integrate.quad(f, 1e-5 / k, 1e2 / k, limit=800,
                            points=[1.] if 1e-5 / k < 1. < 1e2 / k else None)
    return k ** 3 * pk(k) / (252. * (2. * np.pi) ** 2) * val


def test_p22_p13_vs_literature(pk_pair):
    pk_np, pk_jx = pk_pair
    kk = np.array([0.05, 0.1, 0.2])
    tables = OneLoopIntegrals(kk, nr=256, nx=96).tables(pk_jx)
    p22_fw = np.asarray(tables['p22_dd'], dtype='f8')
    p13_fw = np.asarray(tables['p13_dd'], dtype='f8')
    p22_ref = np.array([p22_dd_literature(k, pk_np) for k in kk])
    p13_ref = np.array([p13_dd_literature(k, pk_np) for k in kk])
    np.testing.assert_allclose(p22_fw, p22_ref, rtol=5e-3)
    np.testing.assert_allclose(p13_fw, p13_ref, rtol=5e-3)
