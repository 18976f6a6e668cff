import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.theories import PNGTracerPowerSpectrumMultipoles, ShapeFitPowerSpectrumTemplate
from desilike_tpu.theories.bispectrum import TreeLevelBispectrumMultipoles
from desilike_tpu.observables import TracerBispectrumMultipolesObservable
from desilike_tpu.likelihoods import ObservablesGaussianLikelihood


def test_png_scale_dependent_bias():
    theory = PNGTracerPowerSpectrumMultipoles(
        k=np.linspace(0.003, 0.1, 30), ells=(0,),
        template=ShapeFitPowerSpectrumTemplate(z=1.))
    pipe = theory.pipeline
    p0 = np.asarray(pipe.evaluate({'fnl': 0., 'b1': 2.}))[0]
    p1 = np.asarray(pipe.evaluate({'fnl': 50., 'b1': 2.}))[0]
    ratio = p1 / p0
    # scale-dependent: enhancement grows to low k (1/k^2 T)
    assert ratio[0] > ratio[-1] > 1.0
    assert ratio[0] > 1.05
    # differentiable in fnl
    fn = pipe.get_fn()
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    g = jax.grad(lambda v: jnp.sum(fn(v)[0]))(vals)
    assert np.isfinite(float(g['fnl']))


def test_tree_bispectrum():
    k = np.linspace(0.02, 0.1, 5)
    theory = TreeLevelBispectrumMultipoles(
        triangles=[(kk, kk, kk) for kk in k], ells=(0, 2),
        template=ShapeFitPowerSpectrumTemplate(z=1.))
    B = np.asarray(theory.pipeline.evaluate({'b1': 2.}))
    assert B.shape == (2, 5)
    assert np.all(B[0] > 0)          # equilateral monopole positive
    assert np.all(np.diff(B[0]) < 0)  # decreasing with k
    # b2 increases the bispectrum amplitude
    B2 = np.asarray(theory.pipeline.evaluate({'b1': 2., 'b2': 1.}))
    assert np.all(B2[0] > B[0])


def test_bispectrum_observable_likelihood():
    k = np.linspace(0.02, 0.1, 5)
    obs = TracerBispectrumMultipolesObservable(
        data={'b1': 2.0}, triangles=[(kk, kk, kk) for kk in k], ells=(0,))
    obs.runtime_info.initialize()
    cov = np.diag((0.05 * np.abs(obs.flatdata)) ** 2)
    like = ObservablesGaussianLikelihood(observables=[obs], covariance=cov)
    fn = like.logpost_fn()
    pipe = like.pipeline
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    vals['b1'] = jnp.asarray(2.0)
    lp0, _ = fn(vals)
    lp1, _ = fn({**vals, 'b1': jnp.asarray(2.2)})
    assert np.isfinite(float(lp0)) and float(lp1) < float(lp0)
