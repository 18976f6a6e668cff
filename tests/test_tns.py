"""TNS model: Kaiser limit, independent A/B quadrature anchor, EFT terms."""
import numpy as np
import jax.numpy as jnp
import pytest

from desilike_tpu.core import Pipeline
from desilike_tpu.theories import (TNSTracerPowerSpectrumMultipoles,
                                   EFTLikeTNSTracerPowerSpectrumMultipoles,
                                   KaiserTracerPowerSpectrumMultipoles,
                                   ShapeFitPowerSpectrumTemplate)
from desilike_tpu.ops.tns import TNSCorrections
from desilike_tpu.cosmology import background as bg, linear


def test_tns_kaiser_limit():
    """At k -> 0 with no FOG/bias-loops, TNS must approach Kaiser."""
    k = np.array([0.012, 0.02, 0.03])
    values = {'b1': 2.0, 'sigmav': 0.}
    tns = TNSTracerPowerSpectrumMultipoles(ells=(0, 2), k=k,
                                           template=ShapeFitPowerSpectrumTemplate(z=0.8),
                                           loop_method='quadrature')
    Pipeline(tns).evaluate(values)
    kai = KaiserTracerPowerSpectrumMultipoles(ells=(0, 2), k=k,
                                              template=ShapeFitPowerSpectrumTemplate(z=0.8))
    Pipeline(kai).evaluate({'b1': 2.0})
    ratio = np.asarray(tns.power) / np.asarray(kai.power)
    # loop corrections are percent-level at these scales
    np.testing.assert_allclose(ratio, 1., atol=0.05)


def test_ab_terms_independent_quadrature():
    """A/B tables vs an independent numpy implementation: linear-q trapezoid
    + different Gauss order, built directly from the Taruya 2010 kernels."""
    p = bg.resolve()
    ktab = np.geomspace(1e-4, 50., 800)
    pktab = np.asarray(linear.pk_lin(p, jnp.asarray(ktab), 0.8), dtype='f8')

    def pk_np(q):
        q = np.asarray(q, dtype='f8')
        v = np.exp(np.interp(np.log(np.maximum(q, 1e-12)), np.log(ktab), np.log(pktab)))
        return v * ((q > 1e-4) & (q < 50.))

    kk = np.array([0.08, 0.15])
    engine = TNSCorrections(kk, qrange=(1e-4, 10.), nq=400, nmu=24)
    lk = jnp.asarray(np.log(ktab))
    lp = jnp.asarray(pktab)

    def pk_jx(q):
        return jnp.exp(jnp.interp(jnp.log(q), lk, jnp.log(lp))) * ((q > 1e-4) & (q < 50.))
    t = engine.tables(pk_jx)

    # independent: linear-q trapezoid, 48 GL mu nodes, fresh kernel algebra
    q = np.linspace(1.1e-4, 9.9, 12000)
    dq = q[1] - q[0]
    jq = q ** 2 * dq / (4. * np.pi ** 2)
    mu, wmu = np.polynomial.legendre.leggauss(48)
    for ik, k in enumerate(kk):
        x = (q / k)[:, None]
        m = mu[None, :]
        y2 = 1. + x ** 2 - 2. * x * m
        pkq = pk_np(q)[:, None]
        pky = pk_np(k * np.sqrt(y2))
        pkk = pk_np(np.array([k]))[0]
        # B[0]: n,a,b = 1,1,1 kernel x^2 (mu^2-1)/2 with weight /(x^2 y2)
        kb0 = x ** 2 * (m ** 2 - 1.) / 2.
        b0 = np.sum(wmu * np.sum(jq[:, None] * pkq * pky * kb0 / (x ** 2 * y2), axis=0))
        np.testing.assert_allclose(float(t['B'][0][ik]), b0, rtol=2e-2)
        # B[11]: n,a,b = 4,2,2, the highest-order kernel
        kb11 = x * (8. * m * (-3. + 5. * m ** 2) - 6. * x * (3. - 30. * m ** 2 + 35. * m ** 4)
                    + 6. * x ** 2 * m * (15. - 70. * m ** 2 + 63. * m ** 4)
                    + x ** 3 * (5. - 21. * m ** 2 * (5. - 15. * m ** 2 + 11. * m ** 4))) / y2 / 16.
        b11 = np.sum(wmu * np.sum(jq[:, None] * pkq * pky * kb11 / (x ** 2 * y2), axis=0))
        np.testing.assert_allclose(float(t['B'][11][ik]), b11, rtol=2e-2)
        # A[0] (2D + 1D correction pieces)
        ka0 = -x ** 3 / 7. * (m + 6. * m ** 3 + x ** 2 * m * (-3. + 10. * m ** 2)
                              + x * (-3. + m ** 2 - 12. * m ** 4))
        kta0 = 1. / 7. * (m + x - 2. * x * m ** 2) * (3. * x + 7. * m - 10. * x * m ** 2)
        a0_2d = np.sum(wmu * np.sum(jq[:, None] / x ** 2 * (ka0 * pkk + kta0 * pkq) * pky / y2 ** 2, axis=0))
        from desilike_tpu.ops.tns import a_correction_kernels
        a0_1d = pkk * np.sum(a_correction_kernels((q / k))[0] * jq * pk_np(q))
        np.testing.assert_allclose(float(t['A'][0][ik]), a0_2d + a0_1d, rtol=2e-2)


def test_efttns_marginalizable_counterterms():
    from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable, BoxFootprint
    from desilike_tpu.likelihoods import ObservablesGaussianLikelihood
    theory = EFTLikeTNSTracerPowerSpectrumMultipoles(
        ells=(0, 2), template=ShapeFitPowerSpectrumTemplate(z=0.8), loop_method='quadrature')
    theory.init.params = {'ct*': dict(derived='.marg'), 'sn*': dict(derived='.marg')}
    obs = TracerPowerSpectrumMultipolesObservable(
        data={'b1': 1.8, 'sigmav': 4.}, klim={0: (0.02, 0.2, 0.01), 2: (0.02, 0.2, 0.01)},
        theory=theory)
    like = ObservablesGaussianLikelihood(observables=[obs],
                                         footprints=[BoxFootprint(volume=2e9, nbar=5e-4)])
    fn = like.logpost_fn()
    names = like.pipeline.varied_params.names()
    values = {n: jnp.asarray(like.pipeline.params[n].value) for n in names}
    values.update(b1=jnp.asarray(1.8), sigmav=jnp.asarray(4.))
    lp, aux = fn(values)
    assert np.isfinite(float(lp))
    assert 'ct0_2' in aux['solved']
    # data generated at these params: the solved (marginalized) linear
    # nuisances must come out ~0 (the loglike itself carries the marg logdet)
    for name in ('ct0_2', 'ct2_2', 'sn0', 'sn2_2'):
        if name in aux['solved']:
            assert abs(float(aux['solved'][name])) < 0.5, (name, aux['solved'][name])


def test_a_kernel_series_matches_closed_form():
    """The import-time Fraction-derived patches agree with the closed form
    at both cutoff boundaries, and the masked log gives the exact x=1 limit."""
    from desilike_tpu.ops.tns import a_correction_kernels
    for x0 in (0.04, 0.06, 15., 25.):
        xs = np.full(1, x0)
        direct = a_correction_kernels(xs, x_lo=0., x_hi=np.inf)
        patched = a_correction_kernels(xs, x_lo=(np.inf if x0 < 1 else 0.),
                                       x_hi=(np.inf if x0 < 1 else 0.))
        np.testing.assert_allclose(direct, patched, rtol=0, atol=1e-9)
    k1 = a_correction_kernels(np.array([1.0]))
    # G_m has a (x^2-1)^3 zero at x=1, so the limit is 2 c_m D_m(1) / x^2
    np.testing.assert_allclose(k1[0, 0], (-1. / 84.) * 2. * (19. - 24. + 9.))
    np.testing.assert_allclose(k1[2, 0], (1. / 336.) * 2. * (9. - 185. + 159. - 63.))
    np.testing.assert_allclose(k1[3], k1[1])
