"""Window-convolved joint FS+BAO, 2 tracers, analytic marginalization
(BASELINE.json config 4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.theories import (DampedBAOWigglesTracerPowerSpectrumMultipoles,
                                   BAOPowerSpectrumTemplate, ShapeFitPowerSpectrumTemplate)
from desilike_tpu.theories.full_shape import EFTLikeKaiserTracerPowerSpectrumMultipoles
from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable, BoxFootprint
from desilike_tpu.likelihoods import ObservablesGaussianLikelihood, SumLikelihood


def make_joint_likelihood():
    observables, footprints = [], []
    for tracer, z, b1 in [('LRG', 0.8, 2.0), ('ELG', 1.1, 1.3)]:
        template = ShapeFitPowerSpectrumTemplate(z=z, namespace=tracer)
        theory = EFTLikeKaiserTracerPowerSpectrumMultipoles(
            ells=(0, 2), template=template, namespace=tracer)
        theory.init.params = {'ct*': dict(derived='.marg'), 'sn*': dict(derived='.marg')}
        obs = TracerPowerSpectrumMultipolesObservable(
            data={'{}.b1'.format(tracer): b1},
            klim={0: (0.02, 0.2, 0.01), 2: (0.02, 0.2, 0.01)}, theory=theory)
        observables.append(obs)
        footprints.append(BoxFootprint(volume=3e9, nbar=1e-3))
    return ObservablesGaussianLikelihood(observables=observables, footprints=footprints)


def test_two_tracer_joint():
    like = make_joint_likelihood()
    pipe = like.pipeline
    varied = pipe.varied_params.names()
    # namespaced per-tracer params present
    assert 'LRG.b1' in varied and 'ELG.b1' in varied
    assert 'LRG.dm' in varied and 'ELG.qpar' in varied
    solved = pipe.solved_params.names()
    assert 'LRG.ct0_2' in solved and 'ELG.sn0' in solved
    fn = like.logpost_fn()
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    vals['LRG.b1'] = jnp.asarray(2.0)
    vals['ELG.b1'] = jnp.asarray(1.3)
    lp0, aux = fn(vals)
    assert np.isfinite(float(lp0))
    # per-tracer parameters act independently
    lp1, _ = fn({**vals, 'LRG.dm': jnp.asarray(0.1)})
    lp2, _ = fn({**vals, 'ELG.dm': jnp.asarray(0.1)})
    assert float(lp1) < float(lp0) and float(lp2) < float(lp0)
    assert not np.isclose(float(lp1), float(lp2))
    g = jax.grad(lambda v: fn(v)[0])(vals)
    assert np.isfinite(float(g['LRG.qpar'])) and np.isfinite(float(g['ELG.df']))


def test_sum_of_bao_and_fs():
    """FS likelihood + BAO likelihood summed."""
    fs_theory = EFTLikeKaiserTracerPowerSpectrumMultipoles(
        ells=(0, 2), template=ShapeFitPowerSpectrumTemplate(z=0.8, namespace='fs'), namespace='fs')
    fs_obs = TracerPowerSpectrumMultipolesObservable(
        data={'fs.b1': 1.9}, klim={0: (0.02, 0.2, 0.01), 2: (0.02, 0.2, 0.01)}, theory=fs_theory)
    fs_like = ObservablesGaussianLikelihood(
        observables=[fs_obs], footprints=[BoxFootprint(volume=3e9, nbar=1e-3)], name='fslike')

    bao_theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(
        ells=(0,), template=BAOPowerSpectrumTemplate(z=0.8, apmode='qiso', namespace='bao'), namespace='bao')
    bao_theory.init.params = {'al*': dict(derived='.marg')}
    bao_obs = TracerPowerSpectrumMultipolesObservable(
        data={'bao.b1': 2.0}, klim={0: (0.02, 0.3, 0.01)}, theory=bao_theory)
    bao_like = ObservablesGaussianLikelihood(
        observables=[bao_obs], footprints=[BoxFootprint(volume=3e9, nbar=1e-3)], name='baolike')

    total = fs_like + bao_like
    pipe = total.pipeline
    fn = total.logpost_fn()
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    vals['fs.b1'] = jnp.asarray(1.9)
    vals['bao.b1'] = jnp.asarray(2.0)
    lp0, aux = fn(vals)
    assert np.isfinite(float(lp0))
    lp, _ = fn({**vals, 'bao.qiso': jnp.asarray(1.04)})
    assert float(lp) < float(lp0)
