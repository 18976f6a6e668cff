"""Nested sampler: evidence on an analytic Gaussian + weighted posterior.

Counterpart of the reference's nested-sampler integration tests
(tests/test_samplers.py dynesty/polychord entries); here the evidence has a
closed form so logZ is checked against analytic algebra, not another code.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from desilike_tpu.samplers import NestedSampler
from desilike_tpu.parameters.prior import Prior

from test_samplers import GaussianModel, analytic_cov


def analytic_logz(like):
    """logZ = loglike_max + log (2pi)^{d/2} sqrt(det C) - log(prior volume);
    valid because the posterior mass lies well inside the flat prior box."""
    like.pipeline.evaluate({'a': 1.0, 'b': -0.5})
    loglmax = float(like.loglikelihood)
    cov = analytic_cov()
    d = cov.shape[0]
    vol = np.prod([p.prior.limits[1] - p.prior.limits[0] for p in like.pipeline.varied_params])
    return loglmax + 0.5 * d * np.log(2 * np.pi) + 0.5 * np.linalg.slogdet(cov)[1] - np.log(vol)


def test_prior_transform_matches_host_ppf():
    u = np.linspace(0.01, 0.99, 21)
    for prior in (Prior(limits=(-4, 4)),
                  Prior(dist='norm', loc=0.3, scale=1.7),
                  Prior(dist='norm', loc=0.3, scale=1.7, limits=(-1, 2)),
                  Prior(dist='expon', loc=0., scale=2., limits=(0., 5.)),
                  Prior(dist='loguniform', limits=(0.1, 10.))):
        np.testing.assert_allclose(np.asarray(prior.ppf_jax(jnp.asarray(u))),
                                   prior.ppf(u), rtol=1e-5, atol=1e-7)


def test_nested_evidence_and_posterior():
    like = GaussianModel()
    sampler = NestedSampler(like, seed=11, nlive=512, nbatch=128)
    chain = sampler.run(dlogz=0.05)
    logz = chain.attrs['logz']
    logzerr = chain.attrs['logzerr']
    expected = analytic_logz(like)
    assert np.isfinite(logzerr) and logzerr < 0.5
    assert logz == pytest.approx(expected, abs=max(3 * logzerr, 0.1))
    # weighted posterior moments match the analytic Gaussian
    cov = analytic_cov()
    for i, name in enumerate(('a', 'b')):
        assert chain.mean(name) == pytest.approx((1.0, -0.5)[i], abs=4 * np.sqrt(cov[i, i]) / 10)
        assert chain.std(name) == pytest.approx(np.sqrt(cov[i, i]), rel=0.25)
    # bookkeeping surfaced like the reference's dynesty chain (dynesty.py:140)
    assert 'logweight' in chain and 'aweight' in chain
    assert chain.attrs['niterations'] > 0 and chain.attrs['ncall'] > sampler.nlive
