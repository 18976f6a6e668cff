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


def _sn_truth(z, offset=0.):
    p = bg.resolve()
    dm = np.asarray(bg.comoving_angular_distance(p, np.asarray(z)))
    return 5 * np.log10((1 + np.asarray(z)) * dm / p['h']) + 25 + offset


def test_pantheonplus_dataset_roundtrip(tmp_path):
    """Real Pantheon+ file layout (config.dataset + named-column light-curve
    table + first-line-size covariance) through write_sn_dataset ->
    data_dir= init: z > 0.01 mask applied, heliocentric correction on the
    theory side, chi2 = 0 at the generating cosmology."""
    from desilike_tpu.likelihoods import PantheonPlusSNLikelihood
    from desilike_tpu.likelihoods.supernovae import write_sn_dataset
    rng = np.random.default_rng(5)
    n = 30
    z = np.concatenate([[0.004, 0.008], np.linspace(0.02, 1.2, n - 2)])  # 2 below the cut
    zhel = z + rng.normal(0., 1e-4, n)
    mb = _sn_truth(z, offset=-19.3) + 5 * np.log10((1 + zhel) / (1 + z))
    cov = np.diag(np.full(n, 0.05 ** 2))
    write_sn_dataset(str(tmp_path), {'zHD': z, 'zHEL': zhel, 'm_b_corr': mb}, cov,
                     header='')  # Pantheon+ tables carry a bare header line
    like = PantheonPlusSNLikelihood(data_dir=str(tmp_path), cosmo=varied_cosmo(('omega_cdm',)))
    # chi2 == 0 at truth -> loglike == 0 (mask removed the sub-cut SNe);
    # float32 pipeline -> ~1e-7 absolute tolerance
    like.pipeline.evaluate({'omega_cdm': 0.12, 'Mb': -19.3})
    assert len(like.z) == n - 2 and float(like.z.min()) > 0.01
    assert float(like.loglikelihood) == pytest.approx(0., abs=1e-5)
    fn = like.logpost_fn()
    lp, _ = fn({'omega_cdm': jnp.asarray(0.12), 'Mb': jnp.asarray(-19.3)})
    lp_off, _ = fn({'omega_cdm': jnp.asarray(0.135), 'Mb': jnp.asarray(-19.3)})
    assert float(lp) > float(lp_off)


def test_pantheonplus_shoes_calibrators(tmp_path):
    """SH0ES variant: cepheid-host distances anchor Mb — a wrong Mb is
    penalized even with a free cosmology-side offset degeneracy."""
    from desilike_tpu.likelihoods import PantheonPlusSHOESSNLikelihood
    from desilike_tpu.likelihoods.supernovae import write_sn_dataset
    n = 24
    z = np.linspace(0.005, 1.0, n)
    is_cal = (np.arange(n) % 6 == 0).astype('f8')  # includes z<0.01 entries
    mu = _sn_truth(z)
    ceph = np.where(is_cal > 0.5, mu, 0.)
    mb = mu - 19.3
    cov = np.diag(np.full(n, 0.04 ** 2))
    write_sn_dataset(str(tmp_path),
                     {'zHD': z, 'zHEL': z, 'm_b_corr': mb,
                      'IS_CALIBRATOR': is_cal, 'CEPH_DIST': ceph}, cov, header='')
    like = PantheonPlusSHOESSNLikelihood(data_dir=str(tmp_path))
    like.pipeline.evaluate({'Mb': -19.3})
    # the sub-cut entry is a calibrator, so every row is kept — the z>0.01
    # cut is overridden for calibrators
    assert bool(like._is_calibrator[0]) and len(like.z) == n
    assert float(like.z.min()) < 0.01
    assert float(like.loglikelihood) == pytest.approx(0., abs=1e-5)
    like.pipeline.evaluate({'Mb': -19.25})
    assert float(like.loglikelihood) < -1.


def test_union3_and_desy5_datasets(tmp_path):
    """Union3 (dM offset, dimensionless D_L) and DES-Y5 (CSV light curves,
    MUERR_FINAL added to the covariance diagonal)."""
    from desilike_tpu.likelihoods import Union3SNLikelihood, DESY5SNLikelihood
    from desilike_tpu.likelihoods.supernovae import write_sn_dataset
    # Union3: mb = 5 log10(100 DL[Mpc/h]) + 25 + dM_true
    z = np.linspace(0.05, 2.0, 22)
    p = bg.resolve()
    dl = (1 + z) * np.asarray(bg.comoving_angular_distance(p, z))
    mb = 5 * np.log10(100 * dl) + 25 - 9.2
    d1 = tmp_path / 'union3'
    write_sn_dataset(str(d1), {'zcmb': z, 'mb': mb}, np.diag(np.full(22, 0.03 ** 2)))
    like = Union3SNLikelihood(data_dir=str(d1))
    like.pipeline.evaluate({'dM': -9.2})
    assert float(like.loglikelihood) == pytest.approx(0., abs=1e-5)

    # DES-Y5: comma-separated with '#' comments; MU data; MUERR_FINAL
    n = 20
    z = np.linspace(0.02, 1.1, n)
    muerr = np.full(n, 0.05)
    d2 = tmp_path / 'des'
    write_sn_dataset(str(d2), {'zHD': z, 'zHEL': z, 'MU': _sn_truth(z),
                               'MUERR_FINAL': muerr},
                     np.diag(np.full(n, 0.02 ** 2)), header='', sep=',')
    like = DESY5SNLikelihood(data_dir=str(d2))
    like.pipeline.evaluate({'Mb': 0.})
    assert float(like.loglikelihood) == pytest.approx(0., abs=1e-5)
    # a constant 0.01 offset pins the combined (cov + MUERR^2) variance
    like.pipeline.evaluate({'Mb': 0.01})
    expected = -0.5 * n * 0.01 ** 2 / (0.02 ** 2 + 0.05 ** 2)
    assert float(like.loglikelihood) == pytest.approx(expected, rel=1e-3)


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


def test_new_extractors_fiducial_identity():
    """WiggleSplit/BandVelocity/TurnOver extractors: exact identity values at
    the fiducial cosmology, sensible responses away from it."""
    from desilike_tpu.theories.extractors import (WiggleSplitPowerSpectrumExtractor,
                                                  BandVelocityPowerSpectrumExtractor,
                                                  TurnOverPowerSpectrumExtractor)
    ws = WiggleSplitPowerSpectrumExtractor(z=0.8, cosmo=varied_cosmo(('omega_cdm',)))
    ws.pipeline.evaluate({})
    assert float(ws.qbao) == pytest.approx(1., abs=1e-6)
    assert float(ws.df) == pytest.approx(1., abs=1e-6)
    assert float(ws.dm) == pytest.approx(0., abs=1e-6)
    ws.pipeline.evaluate({'omega_cdm': 0.135})
    assert abs(float(ws.dm)) > 1e-3 and float(ws.df) != pytest.approx(1., abs=1e-3)

    kp = np.array([0.05, 0.1, 0.15])
    bv = BandVelocityPowerSpectrumExtractor(z=0.8, kp=kp, cosmo=varied_cosmo(('omega_cdm',)))
    bv.pipeline.evaluate({})
    np.testing.assert_allclose(np.asarray(bv.dptt), 1., atol=1e-6)
    assert float(bv.df) == pytest.approx(1., abs=1e-6)
    bv.pipeline.evaluate({'omega_cdm': 0.135})
    assert not np.allclose(np.asarray(bv.dptt), 1., atol=1e-3)

    to = TurnOverPowerSpectrumExtractor(z=0.8, cosmo=varied_cosmo(('omega_cdm',)))
    to.pipeline.evaluate({})
    assert float(to.qto) == pytest.approx(1., abs=1e-5)
    assert float(to.DV_times_kTO) > 0.
    kto_fid = float(to.kTO)
    # higher omega_m moves equality (and the turn-over) to larger k
    to.pipeline.evaluate({'omega_cdm': 0.135})
    assert float(to.kTO) > kto_fid


def test_new_compression_observables():
    """WiggleSplit/BandVelocity/TurnOver/P1D compression: peaked at the
    data-generating cosmology (reference compression.py:263-383,
    observables/lya/compression.py)."""
    from desilike_tpu.observables import (WiggleSplitCompressionObservable,
                                          BandVelocityCompressionObservable,
                                          TurnOverCompressionObservable,
                                          P1DCompressionObservable)
    cases = [
        (WiggleSplitCompressionObservable, dict(z=0.8),
         {'qbao': 1., 'qap': 1., 'df': 1., 'dm': 0.}, [0.01, 0.01, 0.02, 0.01]),
        (BandVelocityCompressionObservable, dict(z=0.8, kp=np.array([0.05, 0.1])),
         {'dptt0': 1., 'dptt1': 1., 'df': 1., 'qap': 1.}, [0.02, 0.02, 0.02, 0.01]),
        (TurnOverCompressionObservable, dict(z=0.8),
         None, [5., 0.02]),  # data from the extractor itself below
    ]
    for cls, kw, data, sig in cases:
        if data is None:
            ext = cls._extractor_cls(cosmo=varied_cosmo(('omega_cdm',)), **kw)
            ext.pipeline.evaluate({})
            data = {q: float(getattr(ext, q)) for q in cls._default_quantities}
        obs = cls(data=data, covariance=np.diag(np.asarray(sig) ** 2),
                  cosmo=varied_cosmo(('omega_cdm',)), **kw)
        like = ObservablesGaussianLikelihood(observables=[obs])
        fn = like.logpost_fn()
        lp0, _ = fn({'omega_cdm': jnp.asarray(0.12)})
        lp1, _ = fn({'omega_cdm': jnp.asarray(0.13)})
        assert np.isfinite(float(lp0)) and float(lp0) > float(lp1), cls.__name__

    # Lya P1D: quantities from its own extractor at fiducial
    from desilike_tpu.theories.lya import P1DPowerSpectrumExtractor
    ext = P1DPowerSpectrumExtractor(z=3., cosmo=varied_cosmo(('omega_cdm',)))
    ext.pipeline.evaluate({})
    data = {'delta2_star': float(ext.delta2_star), 'n_star': float(ext.n_star)}
    obs = P1DCompressionObservable(data=data, covariance=np.diag([0.05 ** 2, 0.02 ** 2]),
                                   z=3., cosmo=varied_cosmo(('omega_cdm',)))
    like = ObservablesGaussianLikelihood(observables=[obs])
    fn = like.logpost_fn()
    lp0, _ = fn({'omega_cdm': jnp.asarray(0.12)})
    lp1, _ = fn({'omega_cdm': jnp.asarray(0.13)})
    assert np.isfinite(float(lp0)) and float(lp0) > float(lp1)


def test_baophaseshift_extractor_and_compression():
    """BAO + neutrino phase shift (reference power_template.py:392,
    compression.py:131; arXiv:1803.10741): baoshift = 1 at fiducial N_eff,
    increases with N_ur; compression likelihood peaks at fiducial."""
    from desilike_tpu.theories import BAOPhaseShiftExtractor
    from desilike_tpu.observables import BAOPhaseShiftCompressionObservable
    ext = BAOPhaseShiftExtractor(z=0.8, cosmo=varied_cosmo(('N_ur',)))
    ext.pipeline.evaluate({})
    assert float(ext.baoshift) == pytest.approx(1.0, abs=1e-6)
    data = {'DM_over_rd': float(ext.DM_over_rd), 'DH_over_rd': float(ext.DH_over_rd), 'baoshift': 1.0}
    ext.pipeline.evaluate({'N_ur': 3.0})
    assert float(ext.baoshift) > 1.0
    obs = BAOPhaseShiftCompressionObservable(
        data=data, covariance=np.diag([0.1 ** 2, 0.1 ** 2, 0.1 ** 2]),
        z=0.8, cosmo=varied_cosmo(('N_ur',)))
    like = ObservablesGaussianLikelihood(observables=[obs])
    fn = like.logpost_fn()
    lp0 = float(fn({'N_ur': jnp.asarray(2.0328)})[0])
    lp1 = float(fn({'N_ur': jnp.asarray(3.2)})[0])
    assert np.isfinite(lp0) and lp0 > lp1


def test_compression_from_chain_source(tmp_path):
    """Chains/paths load directly as compression data via load_source
    (reference compression.py:54): best-fit point as data vector, sample
    covariance when none is given."""
    from desilike_tpu.samples.chain import Chain
    from desilike_tpu.theories.extractors import BAOExtractor

    ext = BAOExtractor(z=0.8, cosmo=varied_cosmo(('h', 'omega_cdm')))
    ext.pipeline.evaluate({})
    center = np.array([float(ext.DM_over_rd), float(ext.DH_over_rd)])
    rng = np.random.default_rng(3)
    n = 4000
    cov_true = np.array([[0.04, 0.01], [0.01, 0.0225]])
    draws = rng.multivariate_normal(center, cov_true, size=n)
    lp = -0.5 * np.einsum('ni,ij,nj->n', draws - center, np.linalg.inv(cov_true), draws - center)
    chain = Chain({'DM_over_rd': draws[:, 0], 'DH_over_rd': draws[:, 1], 'logposterior': lp})

    obs = BAOCompressionObservable(data=chain, z=0.8, cosmo=varied_cosmo(('h', 'omega_cdm')))
    obs.runtime_info.initialize()
    # data = best-fit sample; covariance = chain sample covariance
    i = int(np.argmax(lp))
    np.testing.assert_allclose(obs.flatdata, draws[i], rtol=1e-12)
    np.testing.assert_allclose(obs.covariance, np.cov(draws.T), rtol=1e-8)

    # path round-trip + explicit chain covariance source
    fn = tmp_path / 'chain.npz'
    chain.save(fn)
    obs2 = BAOCompressionObservable(data=str(fn), covariance=chain, z=0.8,
                                    cosmo=varied_cosmo(('h', 'omega_cdm')))
    obs2.runtime_info.initialize()
    np.testing.assert_allclose(obs2.flatdata, obs.flatdata)
    like = ObservablesGaussianLikelihood(observables=[obs2])
    lp0, _ = like.logpost_fn()({'h': jnp.asarray(0.6736), 'omega_cdm': jnp.asarray(0.12)})
    assert np.isfinite(float(lp0))
