"""ObservableArray / ObservableCovariance container surface.

Mirrors the reference's observables/types.py behaviors: weighted
slice/select/rebin, xmatch, from_observations + Hartlap/Percival,
marginalize, save/load, and the observable/likelihood integration.
"""

import numpy as np
import pytest

from desilike_tpu.observables import ObservableArray, ObservableCovariance


def make_array(nk=12, projs=(0, 2), name='power'):
    rng = np.random.default_rng(42)
    x = [np.linspace(0.01, 0.23, nk) for _ in projs]
    value = [rng.standard_normal(nk) for _ in projs]
    return ObservableArray(x=x, value=value, projs=list(projs), name=name)


def test_select_xlim_projs():
    obs = make_array()
    sub = obs.select(xlim=(0.05, 0.2))
    assert all((xx >= 0.05).all() and (xx <= 0.2).all() for xx in sub.x)
    only2 = obs.select(projs=[2], select_projs=True)
    assert only2.projs == [2]
    assert np.allclose(only2.flatvalue, obs.value[1])
    # flat_mask agrees with select
    mask = obs.flat_mask(xlim=(0.05, 0.2))
    assert np.allclose(obs.flatvalue[mask], obs.select(xlim=(0.05, 0.2)).flatvalue)


def test_slice_weighted_rebin():
    obs = make_array(nk=12)
    reb = obs.rebin(2)
    assert all(len(xx) == 6 for xx in reb.x)
    assert np.allclose(reb.value[0], obs.value[0].reshape(-1, 2).mean(axis=1))
    # weights accumulate so a second rebin is a proper weighted average
    reb2 = reb.rebin(3)
    assert np.allclose(reb2.value[0], obs.value[0].reshape(-1, 6).mean(axis=1))
    assert np.allclose(reb2.weights[0], 6.)
    # non-uniform weights
    w = np.arange(1., 13.)
    obsw = ObservableArray(x=obs.x, value=obs.value, projs=obs.projs,
                           weights=[w, w])
    rw = obsw.rebin(2)
    expect = (obs.value[0] * w).reshape(-1, 2).sum(axis=1) / w.reshape(-1, 2).sum(axis=1)
    assert np.allclose(rw.value[0], expect)
    # slice with offset
    sl = obs.slice(slice(2, 10, 2), projs=[0])
    assert len(sl.x[0]) == 4 and len(sl.x[1]) == 12


def test_xmatch():
    obs = make_array(nk=12)
    target = obs.rebin(2).select(xlim=(0.05, 0.2))
    matched = obs.xmatch([xx for xx in target.x])
    for a, b in zip(matched.x, target.x):
        assert np.allclose(a, b)
    for a, b in zip(matched.value, target.value):
        assert np.allclose(a, b)
    with pytest.raises(ValueError):
        obs.xmatch(np.array([0.5, 0.6]))


def test_view_and_io(tmp_path):
    obs = make_array()
    v = obs.view(xlim=(0.05, 0.15), projs=[0])
    assert v.ndim == 1 and len(v) < len(obs.value[0])
    fn = tmp_path / 'obs.npz'
    obs.save(fn)
    loaded = ObservableArray.load(fn)
    assert loaded == obs
    assert loaded.name == 'power'
    assert np.asarray(obs).shape == (obs.size,)


def make_cov(nmocks=60, nk=8):
    rng = np.random.default_rng(0)
    obs_list = []
    for i in range(nmocks):
        x = np.linspace(0.01, 0.15, nk)
        obs_list.append([
            ObservableArray(x=[x, x], value=[rng.standard_normal(nk) + 10.,
                                             rng.standard_normal(nk)],
                            projs=[0, 2], name='LRG'),
            ObservableArray(x=[x], value=[rng.standard_normal(nk)],
                            projs=[0], name='QSO')])
    return ObservableCovariance.from_observations(obs_list)


def test_from_observations_and_factors():
    cov = make_cov(nmocks=60, nk=8)
    assert cov.shape == (24, 24)
    assert cov.nobs == 60
    nbins = 24
    assert np.isclose(cov.hartlap2007_factor(), (60 - nbins - 2.) / (60 - 1.))
    f = cov.percival2014_factor(5)
    a = 2. / (60 - nbins - 1.) / (60 - nbins - 4.)
    b = (60 - nbins - 2.) / (60 - nbins - 1.) / (60 - nbins - 4.)
    assert np.isclose(f, (1 + b * (nbins - 5)) / (1 + a + b * 6))
    # mean observable stored
    assert cov.observables[0].name == 'LRG'
    assert cov.observables[0].value[0].mean() > 5.


def test_mock_factors_invalid_regime_raises():
    # nbins = 24; nobs = 26 <= nbins + 2 -> Hartlap undefined
    cov = make_cov(nmocks=26, nk=8)
    with pytest.raises(ValueError):
        cov.hartlap2007_factor()
    with pytest.raises(ValueError):
        cov.percival2014_factor(3)
    # nobs = 28: Hartlap fine (> nbins + 2), Percival still undefined (<= nbins + 4)
    cov = make_cov(nmocks=28, nk=8)
    assert 0. < cov.hartlap2007_factor() < 1.
    with pytest.raises(ValueError):
        cov.percival2014_factor(3)


def test_cov_select_and_names():
    cov = make_cov(nmocks=60, nk=8)
    # select by observable name (wildcard)
    sub = cov.view(observables='LR*', return_type=None)
    assert sub.shape == (16, 16)
    assert [o.name for o in sub.observables] == ['LRG']
    # xlim select keeps block structure
    sub2 = cov.select(xlim=(0.02, 0.1))
    n = sum(o.size for o in sub2.observables)
    assert sub2.shape == (n, n)
    # sub-matrix values match direct masking
    mask = cov._full_mask(xlim=(0.02, 0.1))
    idx = np.flatnonzero(mask)
    assert np.allclose(sub2.value, cov.value[np.ix_(idx, idx)])
    # proj selection on one observable only
    sub3 = cov.select(projs=[0], observables=['LRG'], select_observables=True)
    assert sub3.shape == (8, 8)


def test_cov_marginalize_and_clone():
    cov = make_cov(nmocks=60, nk=8)
    t = np.ones(16)
    marg = cov.marginalize(t, prior=2., observables=['LRG'])
    deriv = np.zeros(24)
    deriv[:16] = 1.
    assert np.allclose(marg.value, cov.value + 2. * np.outer(deriv, deriv))
    assert marg.nobs == cov.nobs
    cl = cov.clone(value=np.eye(24))
    assert np.allclose(cl.value, np.eye(24))
    assert np.allclose(cl.corrcoef(), np.eye(24))


def test_cov_xmatch_rebin():
    cov = make_cov(nmocks=100, nk=8)
    x = np.linspace(0.01, 0.15, 8)
    coarse_x = x.reshape(-1, 2).mean(axis=1)
    reb = cov.xmatch(coarse_x, observables=['LRG'])
    assert reb.shape == (8 + 8, 8 + 8)
    # variance of a 2-bin average: quarter of the summed 2x2 block
    blk = cov.value[:2, :2]
    assert np.isclose(reb.value[0, 0], blk.mean())


def test_cov_io(tmp_path):
    cov = make_cov(nmocks=60, nk=8)
    fn = tmp_path / 'cov.npz'
    cov.save(fn)
    loaded = ObservableCovariance.load(fn)
    assert loaded == cov
    assert loaded.nobs == 60
    assert np.asarray(loaded).shape == cov.shape


def test_observable_likelihood_integration():
    """data=ObservableArray, covariance=ObservableCovariance flow into the
    pk observable and the Gaussian likelihood (with Hartlap from nobs)."""
    from desilike_tpu.theories import (DampedBAOWigglesTracerPowerSpectrumMultipoles,
                                       BAOPowerSpectrumTemplate)
    from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable
    from desilike_tpu.likelihoods import ObservablesGaussianLikelihood

    rng = np.random.default_rng(1)
    k = np.arange(0.02, 0.2, 0.01)
    nk = len(k)
    nmocks = 120
    mocks = [ObservableArray(x=[k, k], value=[1e4 * (1 + 0.05 * rng.standard_normal(nk)),
                                              1e3 * rng.standard_normal(nk)],
                             projs=[0, 2], name='LRG')
             for _ in range(nmocks)]
    cov = ObservableCovariance.from_observations(mocks)
    data = cov.observables[0]

    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(
        ells=(0, 2), template=BAOPowerSpectrumTemplate(z=0.5))
    obs = TracerPowerSpectrumMultipolesObservable(data=data, covariance=cov, theory=theory)
    like = ObservablesGaussianLikelihood(observables=[obs])
    like()
    assert np.isfinite(like.loglikelihood)
    assert np.allclose(obs.flatdata, data.flatvalue)
    expected_hartlap = (nmocks - 2 * nk - 2.) / (nmocks - 1.)
    assert np.isclose(like.hartlap, expected_hartlap)
    # to_array round-trip
    arr = obs.to_array()
    assert list(arr.projs) == [0, 2]
    assert np.allclose(arr.flatvalue, data.flatvalue)
