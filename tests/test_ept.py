"""1-loop EPT full shape with direct cosmology params (BASELINE.json config 3)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.theories.ept import EPTTracerPowerSpectrumMultipoles
from desilike_tpu.theories import ShapeFitPowerSpectrumTemplate, DirectPowerSpectrumTemplate
from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable, BoxFootprint
from desilike_tpu.likelihoods import ObservablesGaussianLikelihood


def small_ept(template=None, ells=(0, 2)):
    return EPTTracerPowerSpectrumMultipoles(
        ells=ells, k=np.linspace(0.02, 0.2, 19), template=template,
        nr=96, nx=48, nk_loop=64, mu=6, nk_template=500)


def test_ept_loop_magnitude():
    """1-loop correction is small at low k, grows at high k, b2 shifts power."""
    theory = small_ept(template=ShapeFitPowerSpectrumTemplate(z=0.8))
    pipe = theory.pipeline
    p_loop = np.asarray(pipe.evaluate({'b1': 1.0, 'b2': 0., 'bs': 0.}))
    assert p_loop.shape == (2, 19) and np.all(np.isfinite(p_loop))
    # compare with linear Kaiser at same bias: loop correction < 25% at k<0.2, z=0.8
    from desilike_tpu.theories.full_shape import KaiserTracerPowerSpectrumMultipoles
    kaiser = KaiserTracerPowerSpectrumMultipoles(
        ells=(0, 2), k=np.linspace(0.02, 0.2, 19),
        template=ShapeFitPowerSpectrumTemplate(z=0.8), mu=6)
    p_lin = np.asarray(kaiser.pipeline.evaluate({'b1': 1.0, 'sn0': 0.}))
    ratio = p_loop[0] / p_lin[0]
    assert np.all(np.abs(ratio - 1.) < 0.3)
    assert abs(ratio[0] - 1.) < 0.08  # small correction at k=0.02
    # b2 response nonzero
    p_b2 = np.asarray(pipe.evaluate({'b1': 1.0, 'b2': 1., 'bs': 0.}))
    assert not np.allclose(p_b2, p_loop, rtol=1e-4)


def test_ept_direct_cosmology_likelihood():
    """Config 3: EPT + direct cosmology parameters, differentiable posterior."""
    template = DirectPowerSpectrumTemplate(z=0.8, varied=('h', 'omega_cdm', 'logA'))
    theory = small_ept(template=template)
    theory.init.params = {'ct*': dict(derived='.marg'), 'sn*': dict(derived='.marg')}
    obs = TracerPowerSpectrumMultipolesObservable(
        data={'b1': 1.7}, klim={0: (0.02, 0.2, 0.01), 2: (0.02, 0.2, 0.01)}, theory=theory)
    like = ObservablesGaussianLikelihood(
        observables=[obs], footprints=[BoxFootprint(volume=5e9, nbar=1e-3)])
    pipe = like.pipeline
    varied = pipe.varied_params.names()
    assert 'h' in varied and 'omega_cdm' in varied and 'logA' in varied
    fn = like.logpost_fn()
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    lp0, aux = fn(vals)
    assert np.isfinite(float(lp0))
    for name, shift in [('h', 0.69), ('omega_cdm', 0.125), ('logA', 3.1)]:
        lp, _ = fn({**vals, name: jnp.asarray(shift)})
        assert float(lp) < float(lp0), name
    g = jax.grad(lambda v: fn(v)[0])(vals)
    assert all(np.isfinite(float(g[n])) for n in ('h', 'omega_cdm', 'logA', 'b1'))
