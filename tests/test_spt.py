"""SPT kernels and 1-loop engines: recursion vs analytic, FFTLog vs quadrature."""
import numpy as np
import jax.numpy as jnp
import pytest

from desilike_tpu.ops.spt import (p13_radial_kernels, p13_kernel_dd_analytic, OneLoopIntegrals)
from desilike_tpu.ops.spt_fftlog import FFTLogOneLoop
from desilike_tpu.cosmology import background as bg, linear


def test_p13_kernels_vs_analytic():
    r = np.geomspace(1e-3, 1e3, 40)
    Kdd, Kdt, Ktt = p13_radial_kernels(r, nx=120)
    Kan = p13_kernel_dd_analytic(r)
    assert np.max(np.abs(Kdd - Kan)) / np.max(np.abs(Kan)) < 1e-5


@pytest.fixture(scope='module')
def pk_fn():
    p = bg.resolve()
    ktab = np.geomspace(1e-5, 100., 1200)
    pktab = np.asarray(linear.pk_lin(p, ktab, 0.8), dtype='f8')
    lk = jnp.asarray(np.log(ktab))
    pkj = jnp.asarray(pktab)

    def fn(kq):
        v = jnp.interp(jnp.log(kq), lk, pkj)
        return v * ((kq > 5e-5) & (kq < 1e2))
    return fn


def test_p13_low_k_limit(pk_fn):
    kk = np.array([0.002, 0.004])
    loop = OneLoopIntegrals(kk, nr=192, nx=64)
    t = loop.tables(pk_fn)
    sv2 = float(t['sigma_v2'])
    pk = np.asarray(pk_fn(jnp.asarray(kk)))
    pred = -61. / 105. * kk ** 2 * sv2 * pk
    ratio = np.asarray(t['p13_dd']) / pred
    np.testing.assert_allclose(ratio, 1., atol=0.08)


def test_fftlog_matches_quadrature(pk_fn):
    kk = np.geomspace(0.03, 0.3, 12)
    quad = OneLoopIntegrals(kk, nr=192, nx=64).tables(pk_fn)
    fftl = FFTLogOneLoop(kk, nfft=128, nr=192, nx=64).tables(pk_fn)
    for name, tol in [('p22_dd', 2e-3), ('p22_dt', 2e-3), ('p22_tt', 2e-3),
                      ('p13_dd', 1e-5), ('pb2_d', 5e-3), ('pbs2_d', 5e-3),
                      ('pb22', 2e-3), ('pb2s2', 2e-3), ('pbs22', 2e-3),
                      ('p_sig3sq', 1e-5)]:
        a, b = np.asarray(quad[name]), np.asarray(fftl[name])
        scale = np.max(np.abs(a))
        assert np.max(np.abs(a - b)) / scale < tol, name


def test_sigma3sq_kernel_limits():
    """sigma_3^2 radial kernel (McDonald & Roy 2009): analytic limits.
    UV (r >> 1): the 8/63 constant cancels the S2 -> 2/3 limit exactly
    (no b1 renormalization): K -> 0. IR (r << 1): S2 -> mu^2 - 1/3 and
    K -> (105/16) [(2/7)(4/45) + 8/63] = 1."""
    from desilike_tpu.ops.spt import sigma3sq_radial_kernel
    K = sigma3sq_radial_kernel(np.array([1e-4, 1e4]))
    assert K[0] == pytest.approx(1.0, rel=1e-3)
    assert abs(K[1]) < 1e-6


def test_sigma3sq_matches_tns_engine():
    """The spt radial-kernel sigma3sq equals the TNS engine's direct 2D
    quadrature (independent implementations of the same reference integral,
    full_shape.py:781)."""
    import jax.numpy as jnp
    from desilike_tpu.ops.spt_fftlog import FFTLogOneLoop
    from desilike_tpu.ops.tns import TNSCorrections
    from desilike_tpu.cosmology import background as bg, linear as lin
    p = bg.resolve({})
    pk_fn = lambda k: lin.pk_lin(p, k, 0.8)
    kk = np.geomspace(0.03, 0.3, 10)
    a = np.asarray(FFTLogOneLoop(kk).tables(pk_fn)['p_sig3sq'])
    c = TNSCorrections(kk).tables(pk_fn)
    b = np.asarray(c['sig3sq'] * pk_fn(jnp.asarray(kk)))
    np.testing.assert_allclose(a, b, rtol=0.02)


def test_b3nl_response():
    """b3nl enters linearly through 2 b1 b3nl sigma3sq P in dd and
    b3nl sigma3sq P in dt (reference full_shape.py:963-968)."""
    import jax.numpy as jnp
    from desilike_tpu.theories import EPTTracerPowerSpectrumMultipoles, ShapeFitPowerSpectrumTemplate
    theory = EPTTracerPowerSpectrumMultipoles(ells=(0, 2), k=np.linspace(0.02, 0.2, 15),
                                              template=ShapeFitPowerSpectrumTemplate(z=0.8), mu=4)
    pipe = theory.pipeline
    p0 = np.asarray(pipe.evaluate({'b1': 2.0, 'b3nl': 0.}))
    p1 = np.asarray(pipe.evaluate({'b1': 2.0, 'b3nl': 1.}))
    p2 = np.asarray(pipe.evaluate({'b1': 2.0, 'b3nl': 2.}))
    resp = p1 - p0
    assert np.max(np.abs(resp)) > 0.
    np.testing.assert_allclose(p2 - p1, resp, rtol=1e-4, atol=1e-3)  # exactly linear
