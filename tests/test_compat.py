"""Reference-parity fill: new small components + reference-name aliases."""

import numpy as np
import pytest

from desilike_tpu.theories import (
    PNGTracerVelocityPowerSpectrumMultipoles,
    FlexibleBAOWigglesTracerCorrelationFunctionMultipoles,
    KaiserTracerPowerSpectrumMultipoles, BandVelocityPowerSpectrumTemplate,
    BandVelocityPowerSpectrumCalculator, ShapeFitPowerSpectrumTemplate)


def test_png_velocity_multipoles():
    """Velocity cross-power is odd in mu: odd multipoles carry the signal,
    the monopole vanishes; fnl adds scale-dependent response at low k
    (reference primordial_non_gaussianity.py:176)."""
    th = PNGTracerVelocityPowerSpectrumMultipoles(k=np.linspace(0.005, 0.1, 20), ells=(0, 1, 3))
    pipe = th.pipeline
    P = np.asarray(pipe.evaluate({'b1': 2., 'bv': 1., 'fnl_loc': 0.}))
    assert P.shape == (3, 20)
    # odd signal dominates; the even projection is quadrature noise
    assert np.abs(P[1]).max() > 1e3 * np.abs(P[0]).max()
    P2 = np.asarray(pipe.evaluate({'b1': 2., 'bv': 1., 'fnl_loc': 100.}))
    ratio = P2[1] / P[1]
    assert np.abs(ratio[0] - 1.) > np.abs(ratio[-1] - 1.)  # low-k enhancement
    # velocity-bias linearity: P ~ bv
    P3 = np.asarray(pipe.evaluate({'b1': 2., 'bv': 2., 'fnl_loc': 0.}))
    np.testing.assert_allclose(P3[1], 2. * P[1], rtol=1e-5)


def test_flexible_bao_xi():
    xi = FlexibleBAOWigglesTracerCorrelationFunctionMultipoles(
        s=np.linspace(40., 160., 30), ells=(0, 2))
    pipe = xi.pipeline
    vals = {p.name: p.value for p in pipe.varied_params}
    out = np.asarray(pipe.evaluate(vals))
    assert out.shape == (2, 30) and np.isfinite(out).all()
    # wiggle-kernel amplitude params exist and respond (xi magnitudes are
    # ~1e-2, so the response to a mid-band kernel is small but clear)
    out2 = np.asarray(pipe.evaluate({**vals, 'ml0_2': vals['ml0_2'] + 0.5}))
    assert np.abs(out2 - out).max() > 1e-5


def test_band_velocity_calculator():
    """Factory turns the band-compression model back into a cosmology
    predictor: dptt/df/qap disappear from the sampled params (reference
    power_template.py:826)."""
    kp = np.linspace(0.02, 0.1, 6)
    theory = KaiserTracerPowerSpectrumMultipoles(
        k=np.linspace(0.02, 0.15, 20), ells=(0, 2),
        template=BandVelocityPowerSpectrumTemplate(kp=kp, z=1.))
    calc = BandVelocityPowerSpectrumCalculator(calculator=theory)
    pipe = calc.pipeline
    names = [p.name for p in pipe.varied_params]
    assert not any(n.startswith('dptt') or n in ('df', 'qap') for n in names)
    vals = {p.name: p.value for p in pipe.varied_params}
    p0 = np.asarray(pipe.evaluate(vals))
    assert np.isfinite(p0).all()
    # at the fiducial cosmology the extracted bands are ~1: the prediction
    # matches the plain band template at its default parameter values
    plain = KaiserTracerPowerSpectrumMultipoles(
        k=np.linspace(0.02, 0.15, 20), ells=(0, 2),
        template=BandVelocityPowerSpectrumTemplate(kp=kp, z=1.))
    ppipe = plain.pipeline
    pv = {p.name: p.value for p in ppipe.varied_params}
    pref = np.asarray(ppipe.evaluate(pv))
    np.testing.assert_allclose(p0, pref, rtol=1e-4)


def test_theory_aliases():
    """Reference wrapper names resolve to the in-framework models and accept
    (and drop) wrapper-specific options."""
    from desilike_tpu.theories import (FOLPSAXTracerPowerSpectrumMultipoles,
                                       GeoFPTAXTracerBispectrumMultipoles,
                                       Cosmoprimo)
    from desilike_tpu.theories.ept import EPTTracerPowerSpectrumMultipoles
    from desilike_tpu.theories.bispectrum import TreeLevelBispectrumMultipoles
    from desilike_tpu.theories.cosmology import Cosmology
    assert issubclass(FOLPSAXTracerPowerSpectrumMultipoles, EPTTracerPowerSpectrumMultipoles)
    assert issubclass(GeoFPTAXTracerBispectrumMultipoles, TreeLevelBispectrumMultipoles)
    assert issubclass(Cosmoprimo, Cosmology)
    # bispectrum alias: reference constructor surface (k=, 3-tuple ells)
    k = np.linspace(0.02, 0.08, 4)
    th = GeoFPTAXTracerBispectrumMultipoles(
        k=[(kk, kk, kk) for kk in k], ells=((0, 0, 0), (2, 0, 0)),
        template=ShapeFitPowerSpectrumTemplate(z=1.), prior_basis='physical')
    B = np.asarray(th.pipeline.evaluate({'b1': 2.}))
    assert B.shape == (2, 4) and np.isfinite(B).all()


def test_sampler_profiler_aliases():
    from desilike_tpu.samplers import (EmceeSampler, ZeusSampler, StaticDynestySampler,
                                       DynamicDynestySampler, NautilusSampler,
                                       PocoMCSampler, PolychordSampler)
    from desilike_tpu.samplers.ensemble import EnsembleSampler, EnsembleSliceSampler
    from desilike_tpu.samplers.nested import NestedSampler
    from desilike_tpu.profilers import MinuitProfiler, BOBYQAProfiler, ScipyProfiler
    assert issubclass(EmceeSampler, EnsembleSampler)
    assert issubclass(ZeusSampler, EnsembleSliceSampler)
    for cls in (StaticDynestySampler, DynamicDynestySampler, NautilusSampler,
                PocoMCSampler, PolychordSampler):
        assert issubclass(cls, NestedSampler)
    assert issubclass(MinuitProfiler, ScipyProfiler)
    assert issubclass(BOBYQAProfiler, ScipyProfiler)


def test_nested_alias_runs():
    """A dynesty-named sampler actually samples (maps onto the in-framework
    nested sampler) and ignores dynesty-specific options."""
    from desilike_tpu.samplers import StaticDynestySampler
    from test_samplers import GaussianModel

    like = GaussianModel()
    sampler = StaticDynestySampler(like, nlive=128, seed=42, bound='multi', sample='rslice')
    chain = sampler.run(dlogz=0.5)
    assert 'a' in chain.names()
    mean_a = float(chain.mean('a'))
    assert abs(mean_a - 1.0) < 0.2


def test_samples_reexports():
    from desilike_tpu.samples import Samples, ParameterBestFit, ParameterCovariance, load_source
    assert issubclass(ParameterBestFit, Samples)  # typed best-fit container
    assert callable(load_source)
    cov = ParameterCovariance(np.eye(2) * 0.1, params=['a', 'b'])
    assert cov.view(params=['a'])[0, 0] == pytest.approx(0.1)


def test_cosmoprimo_host_engine_mapping():
    """Reference scripts pass engine='class'/fiducial='DESI': the alias maps
    host Boltzmann engines to eh99 (warned) or the emulated engine, and
    named fiducials to the framework's DESI defaults."""
    from desilike_tpu.compat import Cosmoprimo
    from desilike_tpu.core import Pipeline
    c = Cosmoprimo(engine='class', fiducial='DESI')
    Pipeline(c).evaluate({})
    assert c.engine == 'eh99'
    assert np.isfinite(float(c.rs_drag()))


def test_tier2_reference_names():
    """Tier-2 reference names (base classes, containers, exceptions) resolve
    to the canonical implementations — identity-preserving assignments."""
    from desilike_tpu import compat
    from desilike_tpu.core.calculator import Calculator
    from desilike_tpu.core.pipeline import Pipeline
    from desilike_tpu.parameters import (Prior, ParameterCollection,
                                         ParameterCovariance, ParameterPrecision)
    assert compat.BaseCalculator is Calculator
    assert compat.BasePipeline is Pipeline
    assert compat.ParameterPrior is Prior
    assert compat.BaseParameterCollection is ParameterCollection
    assert compat.BaseParameterMatrix is ParameterCovariance
    assert ParameterPrecision is not None
    # theory base names
    from desilike_tpu.theories.base import (
        BaseTheoryPowerSpectrumMultipoles,
        BaseTheoryCorrelationFunctionFromPowerSpectrumMultipoles)
    assert issubclass(compat.BaseTheoryPowerSpectrumMultipolesFromWedges,
                      BaseTheoryPowerSpectrumMultipoles)
    assert (compat.BaseTracerCorrelationFunctionFromPowerSpectrumMultipoles
            is BaseTheoryCorrelationFunctionFromPowerSpectrumMultipoles)
    from desilike_tpu.theories.tns import TNSTracerPowerSpectrumMultipoles
    assert compat.TNSPowerSpectrumMultipoles is TNSTracerPowerSpectrumMultipoles
    from desilike_tpu.theories.ept import EPTTracerPowerSpectrumMultipoles
    for name in ('FOLPSAXPowerSpectrumMultipoles', 'REPTVelocileptorsPowerSpectrumMultipoles',
                 'PyBirdPowerSpectrumMultipoles', 'BaseVelocileptorsPowerSpectrumMultipoles'):
        assert issubclass(getattr(compat, name), EPTTracerPowerSpectrumMultipoles)
    # likelihood / sampler names
    from desilike_tpu.likelihoods.cmb.hillipop import BaseHillipopLikelihood
    assert compat.HillipopLikelihood is BaseHillipopLikelihood
    from desilike_tpu.samplers.nested import NestedSampler
    assert issubclass(compat.BaseDynestySampler, NestedSampler)
    # exception aliases bind to what the framework actually raises
    assert compat.ParameterError is ValueError
    assert compat.PipelineError is RuntimeError


def test_reference_import_path_shims():
    """Reference-style import paths resolve (ref desilike/theories/
    galaxy_clustering/__init__.py etc.): subpackage shims forward to the
    native namespaces, top level carries the reference aliases."""
    from desilike_tpu import (BaseCalculator, Calculator, ParameterPrior, Prior,
                              ParameterArray, PipelineError)
    assert BaseCalculator is Calculator and ParameterPrior is Prior
    from desilike_tpu.theories.galaxy_clustering import (
        KaiserTracerPowerSpectrumMultipoles, APEffect,
        DampedBAOWigglesTracerCorrelationFunctionMultipoles,
        ShapeFitPowerSpectrumTemplate)
    from desilike_tpu.theories.primordial_cosmology import Cosmology
    from desilike_tpu.observables.galaxy_clustering import (
        TracerPowerSpectrumMultipolesObservable, BoxFootprint, CutskyFootprint,
        ObservablesCovarianceMatrix, WindowedPowerSpectrumMultipoles,
        BAOCompressionObservable)
    from desilike_tpu.observables.lya import P1DCompressionObservable
    from desilike_tpu.observables.weak_lensing import DESY3Observable
    from desilike_tpu.likelihoods.hubble import Riess2020H0Likelihood
    from desilike_tpu.likelihoods.bbn import Schoneberg2024BBNLikelihood
    from desilike_tpu import theories
    assert ShapeFitPowerSpectrumTemplate is theories.ShapeFitPowerSpectrumTemplate
    with pytest.raises(AttributeError, match='shim'):
        from desilike_tpu.theories import galaxy_clustering
        galaxy_clustering.NotARealName
