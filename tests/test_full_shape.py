"""Kaiser RSD + ShapeFit template (BASELINE.json config 2)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.theories.full_shape import (
    KaiserTracerPowerSpectrumMultipoles, EFTLikeKaiserTracerPowerSpectrumMultipoles,
    KaiserTracerCorrelationFunctionMultipoles)
from desilike_tpu.theories import ShapeFitPowerSpectrumTemplate, FixedPowerSpectrumTemplate
from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable, BoxFootprint
from desilike_tpu.likelihoods import ObservablesGaussianLikelihood


def test_kaiser_amplitude():
    """Kaiser multipoles match the analytic Kaiser factors for f, b1."""
    tpl = FixedPowerSpectrumTemplate(z=1.)
    theory = KaiserTracerPowerSpectrumMultipoles(
        ells=(0, 2, 4), k=np.linspace(0.02, 0.2, 19), template=tpl, mu=40)
    power = np.asarray(theory.pipeline.evaluate({'b1': 2.0, 'sn0': 0.}))
    tpl.runtime_info.initialize()
    f = tpl.f_fid
    pk = np.interp(theory.k, tpl.k, np.asarray(tpl.pk_dd_fid))
    b1 = 2.0
    beta = f / b1
    mono = b1 ** 2 * (1. + 2. / 3. * beta + 1. / 5. * beta ** 2) * pk
    quad = b1 ** 2 * (4. / 3. * beta + 4. / 7. * beta ** 2) * pk
    hexa = b1 ** 2 * (8. / 35. * beta ** 2) * pk
    np.testing.assert_allclose(power[0], mono, rtol=2e-3)
    np.testing.assert_allclose(power[1], quad, rtol=2e-3)
    np.testing.assert_allclose(power[2], hexa, rtol=2e-3)


def test_shapefit_kaiser_likelihood():
    tpl = ShapeFitPowerSpectrumTemplate(z=0.8)
    theory = EFTLikeKaiserTracerPowerSpectrumMultipoles(ells=(0, 2), template=tpl)
    theory.init.params = {'ct*': dict(derived='.marg'), 'sn*': dict(derived='.marg')}
    obs = TracerPowerSpectrumMultipolesObservable(
        data={'b1': 1.8}, klim={0: (0.02, 0.2, 0.005), 2: (0.02, 0.2, 0.005)}, theory=theory)
    like = ObservablesGaussianLikelihood(
        observables=[obs], footprints=[BoxFootprint(volume=5e9, nbar=1e-3)])
    pipe = like.pipeline
    varied = pipe.varied_params.names()
    assert 'dm' in varied and 'df' in varied and 'qpar' in varied
    solved = pipe.solved_params.names()
    assert 'ct0_2' in solved and 'sn0' in solved  # 'sn*' matches sn0 too
    fn = like.logpost_fn()
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    vals['b1'] = jnp.asarray(1.8)
    lp0, aux = fn(vals)
    assert np.isfinite(float(lp0))
    # dm/df shift away from truth lowers the posterior
    for name, val in [('dm', 0.1), ('df', 1.1), ('qpar', 1.05)]:
        lp, _ = fn({**vals, name: jnp.asarray(val)})
        assert float(lp) < float(lp0)
    # gradient-based: differentiable in all varied params
    g = jax.grad(lambda v: fn(v)[0])(vals)
    assert all(np.isfinite(float(g[n])) for n in varied)


def test_kaiser_correlation_function():
    theory = KaiserTracerCorrelationFunctionMultipoles(
        s=np.linspace(30., 150., 41), ells=(0, 2), template=ShapeFitPowerSpectrumTemplate(z=0.8))
    corr = np.asarray(theory.pipeline.evaluate({'b1': 2.0}))
    assert corr.shape == (2, 41)
    assert np.all(np.isfinite(corr))
    # monopole positive at BAO scales for b1=2
    assert np.all(corr[0][theory.s < 100] > 0)


def test_simple_tracer():
    from desilike_tpu.theories import SimpleTracerPowerSpectrumMultipoles, StandardPowerSpectrumTemplate
    theory = SimpleTracerPowerSpectrumMultipoles(
        ells=(0, 2), k=np.linspace(0.02, 0.2, 19),
        template=StandardPowerSpectrumTemplate(z=1.), mu=6)
    p = np.asarray(theory.pipeline.evaluate({'b1': 2.0, 'df': 1.0}))
    assert p.shape == (2, 19) and np.all(np.isfinite(p))
    p2 = np.asarray(theory.pipeline.evaluate({'b1': 2.0, 'df': 1.1}))
    assert np.all(p2[1] > p[1])  # more growth -> larger quadrupole
