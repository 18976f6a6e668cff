"""End-to-end BAO posterior recovery (BASELINE.json config 1)."""
import numpy as np
import jax.numpy as jnp
import pytest

from desilike_tpu.theories import (DampedBAOWigglesTracerPowerSpectrumMultipoles,
                                   BAOPowerSpectrumTemplate)
from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable, BoxFootprint
from desilike_tpu.likelihoods import ObservablesGaussianLikelihood
from desilike_tpu.samplers import EnsembleSampler


def make_likelihood(qiso_truth=1.0, marg=True):
    template = BAOPowerSpectrumTemplate(z=0.8, apmode='qiso')
    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=(0,), template=template)
    if marg:
        theory.init.params = {'al*': dict(derived='.marg')}
    obs = TracerPowerSpectrumMultipolesObservable(
        data={'qiso': qiso_truth, 'b1': 2.0},
        klim={0: (0.02, 0.3, 0.005)}, theory=theory)
    footprint = BoxFootprint(volume=2e9, nbar=5e-4)  # DESI-LRG-ish
    return ObservablesGaussianLikelihood(observables=[obs], footprints=[footprint])


def test_bao_posterior_recovery():
    like = make_likelihood(qiso_truth=1.02)
    sampler = EnsembleSampler(like, seed=17, nwalkers=64)
    chain = sampler.run(nsteps=1200).remove_burnin(0.5)
    qmean = chain.mean('qiso')
    qstd = chain.std('qiso')
    # noiseless data at qiso=1.02: posterior must center there well within 1 sigma
    assert abs(qmean - 1.02) < 0.5 * qstd
    assert 0.002 < qstd < 0.05  # sane DESI-like constraint scale
    assert np.all(chain.gelman_rubin(['qiso', 'b1']) < 1.15)
    # marginalized broadband params present as solved draws in aux columns
    assert 'al0_0' in chain


def test_posterior_sampler_cross_validation():
    """Accuracy-gate proxy (BASELINE sub-0.01-sigma vs reference requires
    cosmoprimo, absent here): two independent samplers + the Fisher forecast
    must agree on the same BAO posterior."""
    from desilike_tpu.samplers import NUTSSampler
    from desilike_tpu.fisher import Fisher
    like = make_likelihood(qiso_truth=1.0)
    ens = EnsembleSampler(like, seed=31, nwalkers=64).run(nsteps=1500).remove_burnin(0.5)
    nuts = NUTSSampler(like, seed=32, nchains=4, max_depth=6).run(nsteps=400, nwarmup=300).remove_burnin(0.2)
    fisher = Fisher(like)()
    for name in ('qiso', 'b1'):
        m1, s1 = ens.mean(name), ens.std(name)
        m2, s2 = nuts.mean(name), nuts.std(name)
        assert abs(m1 - m2) < 0.25 * max(s1, s2), (name, m1, m2, s1, s2)
        assert s1 / s2 == pytest.approx(1.0, abs=0.3), (name, s1, s2)
    # Fisher width consistent with the sampled width for the Gaussian-ish
    # qiso direction (b1 is prior-truncated and non-Gaussian here)
    assert ens.std('qiso') / fisher.std('qiso') == pytest.approx(1.0, abs=0.45)
