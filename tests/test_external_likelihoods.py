"""BBN / H0 / CMB-distance / SN likelihoods (reference tests/test_likelihoods.py
pattern: published means recovered)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.likelihoods import (Schoneberg2024BBNLikelihood, Riess2020H0Likelihood,
                                      Riess2020MbLikelihood, CMBDistancePriorLikelihood,
                                      BaseSNLikelihood, SumLikelihood)
from desilike_tpu.theories import Cosmology
from desilike_tpu.observables import BAOCompressionObservable, ShapeFitCompressionObservable
from desilike_tpu.likelihoods import ObservablesGaussianLikelihood
from desilike_tpu.cosmology import background as bg


def varied_cosmo(names=('h', 'omega_cdm', 'omega_b')):
    from desilike_tpu.theories.power_template import _direct_param
    cosmo = Cosmology()
    for name in names:
        cosmo.init.params.set(_direct_param(name))
    return cosmo


def test_bbn_likelihood():
    cosmo = varied_cosmo(('omega_b',))
    like = Schoneberg2024BBNLikelihood(cosmo=cosmo)
    fn = like.logpost_fn()
    lp_mean, _ = fn({'omega_b': jnp.asarray(0.02196)})
    lp_off, _ = fn({'omega_b': jnp.asarray(0.0230)})
    assert float(lp_mean) > float(lp_off)
    # 1-sigma shift in omega_b ~ delta chi2 of order 1 (correlated with N_eff)
    sig = np.sqrt(4.03112260e-07)
    lp_1s, _ = fn({'omega_b': jnp.asarray(0.02196 + sig)})
    assert 2 * (float(lp_mean) - float(lp_1s)) < 3.


def test_h0_and_mb():
    cosmo = varied_cosmo(('h',))
    like = Riess2020H0Likelihood(cosmo=cosmo)
    fn = like.logpost_fn()
    lp0, _ = fn({'h': jnp.asarray(0.732)})
    lp1, _ = fn({'h': jnp.asarray(0.70)})
    assert float(lp0) > float(lp1)
    mb = Riess2020MbLikelihood()
    fnm = mb.logpost_fn()
    lp0, _ = fnm({'Mb': jnp.asarray(-19.263)})
    lp1, _ = fnm({'Mb': jnp.asarray(-19.0)})
    assert float(lp0) > float(lp1)


def test_cmb_distance_prior():
    cosmo = varied_cosmo(('h', 'omega_cdm', 'omega_b'))
    like = CMBDistancePriorLikelihood(cosmo=cosmo)
    fn = like.logpost_fn()
    vals = {'h': jnp.asarray(0.6736), 'omega_cdm': jnp.asarray(0.12), 'omega_b': jnp.asarray(0.02237)}
    lp0, aux = fn(vals)
    assert np.isfinite(float(lp0))
    # theory R/lA near Planck values at the Planck cosmology (within ~1.5%)
    like.pipeline.evaluate({k: float(v) for k, v in vals.items()})
    R, lA, ob = [float(x) for x in np.asarray(like.flattheory())]
    assert abs(R - 1.7502) / 1.7502 < 0.015
    assert abs(lA - 301.47) / 301.47 < 0.015
    g = jax.grad(lambda v: fn(v)[0])(vals)
    assert all(np.isfinite(float(g[k])) for k in vals)


def test_sn_likelihood_with_marg_mb():
    rng = np.random.default_rng(3)
    z = np.linspace(0.05, 1.0, 40)
    p = bg.resolve()
    dm = np.asarray(bg.comoving_angular_distance(p, z))
    mu = 5 * np.log10((1 + z) * dm / p['h']) + 25
    mags = mu - 19.3
    cov = np.diag(np.full(40, 0.02 ** 2))
    cosmo = varied_cosmo(('omega_cdm',))
    like = BaseSNLikelihood(z=z, magnitudes=mags, covariance=cov, cosmo=cosmo)
    like.init.params = {'Mb': dict(derived='.marg')}
    fn = like.logpost_fn()
    lp0, aux = fn({'omega_cdm': jnp.asarray(0.12)})
    lp1, _ = fn({'omega_cdm': jnp.asarray(0.135)})
    assert float(lp0) > float(lp1)
    assert abs(float(aux['solved']['Mb']) + 19.3) < 0.01  # recovers injected Mb


def test_compression_observables():
    # data generated from the fiducial extractor itself
    from desilike_tpu.theories.extractors import BAOExtractor
    cosmo = varied_cosmo(('h', 'omega_cdm'))
    ext = BAOExtractor(z=0.8, cosmo=cosmo)
    ext.pipeline.evaluate({})
    data = {'DM_over_rd': float(ext.DM_over_rd), 'DH_over_rd': float(ext.DH_over_rd)}
    obs = BAOCompressionObservable(data=data, covariance=np.diag([0.1 ** 2, 0.1 ** 2]),
                                   z=0.8, cosmo=varied_cosmo(('h', 'omega_cdm')))
    like = ObservablesGaussianLikelihood(observables=[obs])
    fn = like.logpost_fn()
    lp0, _ = fn({'h': jnp.asarray(0.6736), 'omega_cdm': jnp.asarray(0.12)})
    lp1, _ = fn({'h': jnp.asarray(0.6736), 'omega_cdm': jnp.asarray(0.135)})
    assert np.isfinite(float(lp0)) and float(lp0) > float(lp1)
