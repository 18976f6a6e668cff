import numpy as np
import jax.numpy as jnp
import pytest

from desilike_tpu.theories.full_shape import KaiserTracerPowerSpectrumMultipoles
from desilike_tpu.theories import ShapeFitPowerSpectrumTemplate
from desilike_tpu.observables import (TopHatFiberCollisionsPowerSpectrumMultipoles,
                                      FiberCollisionsPowerSpectrumMultipoles,
                                      SystematicTemplatePowerSpectrumMultipoles)


def kaiser():
    return KaiserTracerPowerSpectrumMultipoles(
        ells=(0, 2), k=np.linspace(0.02, 0.2, 30),
        template=ShapeFitPowerSpectrumTemplate(z=1.), mu=6)


def test_tophat_fiber_collisions():
    fc = TopHatFiberCollisionsPowerSpectrumMultipoles(
        k=np.linspace(0.02, 0.2, 25), ells=(0, 2), theory=kaiser(), fs=0.5, Dfc=0.5)
    power = np.asarray(fc.pipeline.evaluate({'b1': 2.0}))
    assert power.shape == (2, 25) and np.all(np.isfinite(power))
    # zero collision scale -> identity (up to grid interpolation)
    fc0 = TopHatFiberCollisionsPowerSpectrumMultipoles(
        k=np.linspace(0.02, 0.2, 25), ells=(0, 2), theory=kaiser(), fs=0.5, Dfc=0.)
    p0 = np.asarray(fc0.pipeline.evaluate({'b1': 2.0}))
    th = np.asarray(fc0.theory.power)
    interp = np.stack([np.interp(fc0.k, fc0.kin, th[i]) for i in range(2)])
    np.testing.assert_allclose(p0, interp, rtol=1e-3)
    # collisions change the power
    assert not np.allclose(power, p0, rtol=1e-4)


def test_general_fiber_collisions_matches_tophat():
    """Sum-of-tophats kernel with a single top-hat ~ TopHat class at small kDfc."""
    k = np.linspace(0.02, 0.1, 15)
    fs, Dfc = 0.4, 0.3
    fc1 = TopHatFiberCollisionsPowerSpectrumMultipoles(k=k, ells=(0,), theory=kaiser(), fs=fs, Dfc=Dfc)
    fc2 = FiberCollisionsPowerSpectrumMultipoles(k=k, ells=(0,), theory=kaiser(),
                                                 sep=np.linspace(0., Dfc, 10), kernel=fs)
    p1 = np.asarray(fc1.pipeline.evaluate({'b1': 2.0}))
    p2 = np.asarray(fc2.pipeline.evaluate({'b1': 2.0}))
    np.testing.assert_allclose(p1, p2, rtol=0.05)


def kaiser_xi():
    from desilike_tpu.theories.full_shape import KaiserTracerCorrelationFunctionMultipoles
    return KaiserTracerCorrelationFunctionMultipoles(
        ells=(0, 2), s=np.linspace(30., 140., 23),
        template=ShapeFitPowerSpectrumTemplate(z=1.), mu=6)


def test_tophat_fiber_collisions_xi_brute_force():
    """Kernel application == direct mu integration of
    xi'(s,mu) = xi - fs theta(s_perp<Dfc) (1 + xi) (Hahn+16 s-space model)."""
    from desilike_tpu.observables import TopHatFiberCollisionsCorrelationFunctionMultipoles
    fs, Dfc = 0.6, 60.0  # huge Dfc so the cut bites at these separations
    fc = TopHatFiberCollisionsCorrelationFunctionMultipoles(
        ells=(0, 2, 4), theory=kaiser_xi(), fs=fs, Dfc=Dfc)
    corr = np.asarray(fc.pipeline.evaluate({'b1': 2.0}))
    xi_in = np.asarray(fc.theory.corr)  # (nellsin, ns) on the same s grid
    s = fc.s
    mu = np.linspace(-1., 1., 20001)
    from numpy.polynomial.legendre import Legendre
    legs_in = [Legendre.basis(ell)(mu) for ell in fc.ellsin]
    for io, ellout in enumerate(fc.ells):
        Pout = Legendre.basis(ellout)(mu)
        expected = np.empty_like(s)
        for js, sv in enumerate(s):
            xi_smu = sum(xi_in[ii, js] * legs_in[ii] for ii in range(len(fc.ellsin)))
            cut = (sv * np.sqrt(1. - mu ** 2)) < Dfc
            integrand = xi_smu - fs * cut * (1. + xi_smu)
            expected[js] = (2 * ellout + 1) / 2. * np.trapezoid(integrand * Pout, x=mu)
        # the theta-function discontinuity limits the trapezoid check to O(dmu)
        np.testing.assert_allclose(corr[io], expected, rtol=1e-3, atol=5e-4)
    # zero collision scale -> identity
    fc0 = TopHatFiberCollisionsCorrelationFunctionMultipoles(ells=(0, 2), theory=kaiser_xi(), fs=fs, Dfc=0.)
    np.testing.assert_allclose(np.asarray(fc0.pipeline.evaluate({'b1': 2.0})),
                               np.asarray(fc0.theory.corr), rtol=1e-6, atol=1e-9)


def test_general_fiber_collisions_xi_matches_tophat():
    from desilike_tpu.observables import (TopHatFiberCollisionsCorrelationFunctionMultipoles,
                                          FiberCollisionsCorrelationFunctionMultipoles)
    fs, Dfc = 0.4, 40.0
    fc1 = TopHatFiberCollisionsCorrelationFunctionMultipoles(theory=kaiser_xi(), fs=fs, Dfc=Dfc)
    fc2 = FiberCollisionsCorrelationFunctionMultipoles(
        theory=kaiser_xi(), sep=np.linspace(0., Dfc, 10), kernel=fs)
    c1 = np.asarray(fc1.pipeline.evaluate({'b1': 2.0}))
    c2 = np.asarray(fc2.pipeline.evaluate({'b1': 2.0}))
    np.testing.assert_allclose(c1, c2, rtol=1e-6, atol=1e-8)
    # to_tophat round-trips the (fs, Dfc) moments
    fc3 = fc2.to_tophat()
    assert fc3.fs == pytest.approx(fs, rel=0.01) and fc3.Dfc == pytest.approx(Dfc, rel=0.05)


def test_windowed_xi_folds_fiber_collisions():
    """fiber_collisions= folded into the window matrix == applying the
    collision calculator as the theory of a plain windowed xi."""
    from desilike_tpu.observables import (WindowedCorrelationFunctionMultipoles,
                                          TopHatFiberCollisionsCorrelationFunctionMultipoles)
    slim = {0: (40., 120., 8.), 2: (40., 120., 8.)}
    wfold = WindowedCorrelationFunctionMultipoles(
        slim=slim, theory=kaiser_xi(),
        fiber_collisions=TopHatFiberCollisionsCorrelationFunctionMultipoles(fs=0.5, Dfc=50.))
    folded = np.asarray(wfold.pipeline.evaluate({'b1': 2.0}))
    wplain = WindowedCorrelationFunctionMultipoles(slim=slim, theory=kaiser_xi())
    wplain.runtime_info.initialize()
    fc = TopHatFiberCollisionsCorrelationFunctionMultipoles(
        s=wplain.sin, ells=wplain.ellsin, theory=wplain.theory, fs=0.5, Dfc=50.)
    chained = np.asarray(fc.pipeline.evaluate({'b1': 2.0}))
    expected = np.asarray(wplain.wmatrix) @ chained.reshape(-1)
    np.testing.assert_allclose(folded, expected, rtol=1e-5, atol=1e-7)


def test_windowed_pk_folds_fiber_collisions():
    from desilike_tpu.observables import (WindowedPowerSpectrumMultipoles,
                                          TopHatFiberCollisionsPowerSpectrumMultipoles)
    klim = {0: (0.02, 0.18, 0.01), 2: (0.02, 0.18, 0.01)}
    wfold = WindowedPowerSpectrumMultipoles(
        klim=klim, theory=kaiser(),
        fiber_collisions=TopHatFiberCollisionsPowerSpectrumMultipoles(fs=0.5, Dfc=0.5))
    folded = np.asarray(wfold.pipeline.evaluate({'b1': 2.0}))
    wplain = WindowedPowerSpectrumMultipoles(klim=klim, theory=kaiser())
    wplain.runtime_info.initialize()
    fc = TopHatFiberCollisionsPowerSpectrumMultipoles(
        k=wplain.kin, ells=wplain.ellsin, theory=wplain.theory, fs=0.5, Dfc=0.5)
    chained = np.asarray(fc.pipeline.evaluate({'b1': 2.0}))
    expected = np.asarray(wplain.wmatrix) @ chained.reshape(-1)
    np.testing.assert_allclose(folded, expected, rtol=1e-5, atol=1e-7)


def test_windowed_systematic_templates():
    """Post-window templates: amplitude parameters shift the flat data vector
    by exactly a_i T_i, on both pk and xi observables."""
    from desilike_tpu.observables import (WindowedPowerSpectrumMultipoles,
                                          WindowedCorrelationFunctionMultipoles)
    klim = {0: (0.02, 0.18, 0.01), 2: (0.02, 0.18, 0.01)}
    wp = WindowedPowerSpectrumMultipoles(
        klim=klim, theory=kaiser(),
        systematic_templates={'syst_a': lambda k: 1e2 / k, 'syst_b': lambda k: k * 0. + 50.})
    assert set(wp.pipeline.params.names()) >= {'syst_a', 'syst_b'}
    f0 = np.asarray(wp.pipeline.evaluate({'b1': 2.0}))
    f1 = np.asarray(wp.pipeline.evaluate({'b1': 2.0, 'syst_a': 1.5}))
    expected = 1.5 * np.concatenate([1e2 / kk for kk in wp.k])
    np.testing.assert_allclose(f1 - f0, expected, rtol=1e-6, atol=1e-8)
    wx = WindowedCorrelationFunctionMultipoles(
        slim={0: (40., 120., 8.)}, theory=kaiser_xi(),
        systematic_templates=[lambda s: 1. / s ** 2])
    c0 = np.asarray(wx.pipeline.evaluate({'b1': 2.0}))
    c1 = np.asarray(wx.pipeline.evaluate({'b1': 2.0, 'syst_0': 3.}))
    np.testing.assert_allclose(c1 - c0, 3. / np.concatenate(wx.s) ** 2, rtol=1e-6, atol=1e-12)


def test_systematic_templates():
    k = np.linspace(0.02, 0.2, 30)
    templates = [np.stack([1e3 * np.ones_like(k), np.zeros_like(k)])]
    st = SystematicTemplatePowerSpectrumMultipoles(templates=templates, theory=kaiser())
    p0 = np.asarray(st.pipeline.evaluate({'b1': 2.0, 'syst_0': 0.}))
    p1 = np.asarray(st.pipeline.evaluate({'b1': 2.0, 'syst_0': 2.}))
    np.testing.assert_allclose(p1[0] - p0[0], 2e3, rtol=1e-4)
    np.testing.assert_allclose(p1[1], p0[1], rtol=1e-5)
