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
                      ('pb22', 2e-3), ('pb2s2', 2e-3), ('pbs22', 2e-3)]:
        a, b = np.asarray(quad[name]), np.asarray(fftl[name])
        scale = np.max(np.abs(a))
        assert np.max(np.abs(a - b)) / scale < tol, name
