"""External data-product interop: pypower-style states, window matrices,
glob mock loading, load_source (round-1 review item 5)."""
import numpy as np
import jax.numpy as jnp
import pytest

from desilike_tpu import interop
from desilike_tpu.core import Pipeline
from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable
from desilike_tpu.observables.window import WindowedPowerSpectrumMultipoles
from desilike_tpu.theories import KaiserTracerPowerSpectrumMultipoles


def make_pypower_state(k, ells=(0, 2), shotnoise=1234., seed=0):
    """A serialized pypower-style PowerSpectrumMultipoles state."""
    rng = np.random.default_rng(seed)
    power = np.array([1e4 * (1. + ell) / (1. + (k / 0.1) ** 1.5) + rng.normal(0, 10., k.size)
                      for ell in ells])
    edges = np.concatenate([k - (k[1] - k[0]) / 2, [k[-1] + (k[1] - k[0]) / 2]])
    wnorm = 7.3
    state = {
        'k': k, 'ells': np.array(ells), 'edges': [edges], 'wnorm': wnorm,
        'power_nonorm': (power + shotnoise * np.array([[1.], [0.]])) * wnorm,
        'shotnoise_nonorm': shotnoise * wnorm,
    }
    return state, power


def test_read_pypower_state_dict(tmp_path):
    k = np.arange(0.005, 0.4, 0.005) + 0.0025
    state, power = make_pypower_state(k)
    fn = tmp_path / 'poles.npy'
    np.save(fn, state)
    meas = interop.read_power_multipoles(str(fn))
    assert meas['ells'] == (0, 2)
    assert meas['shotnoise'] == pytest.approx(1234.)
    np.testing.assert_allclose(meas['power'], power, rtol=1e-10)


def test_klim_selection_and_rebin(tmp_path):
    k = np.arange(0.005, 0.4, 0.005) + 0.0025
    state, power = make_pypower_state(k)
    meas = interop.read_power_multipoles(state)
    list_k, kedges, ells, flat, sn = interop.select_multipoles(
        meas, klim={0: (0.02, 0.2, 0.01), 2: (0.02, 0.2, 0.01)})
    assert ells == (0, 2)
    # 0.005-wide bins rebinned by 2 -> 0.01 spacing
    assert np.allclose(np.diff(list_k[0]), 0.01)
    assert (list_k[0] >= 0.02).all() and (list_k[0] <= 0.2).all()
    # rebinned values are pair averages (k grid has odd length: drop tail)
    n = (len(k) // 2) * 2
    kreb = k[:n].reshape(-1, 2).mean(axis=1)
    preb = power[0][:n].reshape(-1, 2).mean(axis=1)
    i0 = np.flatnonzero((kreb >= 0.02) & (kreb <= 0.2))
    np.testing.assert_allclose(flat[:len(list_k[0])], preb[i0], rtol=1e-10)


def test_observable_loads_mock_files(tmp_path):
    k = np.arange(0.005, 0.3, 0.005) + 0.0025
    for i in range(6):
        state, _ = make_pypower_state(k, seed=i)
        np.save(tmp_path / 'mock_{:d}.npy'.format(i), state)
    state, _ = make_pypower_state(k, seed=99)
    np.save(tmp_path / 'data.npy', state)
    obs = TracerPowerSpectrumMultipolesObservable(
        data=str(tmp_path / 'data.npy'),
        covariance=[str(tmp_path / 'mock_*.npy')],
        klim={0: (0.02, 0.2, 0.01), 2: (0.02, 0.2, 0.01)},
        theory=KaiserTracerPowerSpectrumMultipoles())
    obs.runtime_info.initialize()
    assert obs.nmocks == 6
    assert obs.wmatrix.shotnoise == pytest.approx(1234.)
    assert obs.flatdata.size == sum(len(kk) for kk in obs.k)
    assert obs.covariance.shape == (obs.flatdata.size,) * 2


def make_window_state(kin, kout, ellsin=(0, 2, 4), ellsout=(0, 2), seed=3):
    """A pypower BaseMatrix-style serialized window state (value is
    (nin_tot, nout_tot) as in pypower; our reader transposes)."""
    rng = np.random.default_rng(seed)
    nin, nout = len(kin), len(kout)
    blocks = np.zeros((len(ellsin) * nin, len(ellsout) * nout))
    for i, elli in enumerate(ellsin):
        for j, ellj in enumerate(ellsout):
            # smooth, diagonally-dominant coupling
            W = np.exp(-((kout[None, :] - kin[:, None]) / 0.01) ** 2)
            W /= W.sum(axis=0, keepdims=True)
            amp = 1. if elli == ellj else 0.05
            blocks[i * nin:(i + 1) * nin, j * nout:(j + 1) * nout] = amp * W
    vectorout = [np.full(nout, 1. - 0.1 * j) for j in range(len(ellsout))]
    return {'xin': [kin] * len(ellsin), 'xout': [kout] * len(ellsout),
            'projsin': [{'ell': e, 'wa_order': 0} for e in ellsin],
            'projsout': [{'ell': e, 'wa_order': None} for e in ellsout],
            'value': blocks, 'vectorout': vectorout}


def test_window_matrix_klim_and_kin_regrid(tmp_path):
    kin = np.geomspace(1e-3, 0.5, 300)
    kout = np.arange(0.005, 0.3, 0.005) + 0.0025
    state = make_window_state(kin, kout)
    fn = tmp_path / 'wmatrix.npy'
    np.save(fn, state)
    klim = {0: (0.02, 0.2), 2: (0.02, 0.2)}
    kin_new = np.geomspace(2e-3, 0.4, 120)
    kin_got, matrix, list_kout, ellsin, wsn = interop.read_window_matrix(
        str(fn), ells=(0, 2), klim=klim, kin=kin_new)
    assert ellsin == (0, 2, 4)
    np.testing.assert_allclose(kin_got, kin_new)
    assert matrix.shape == (sum(len(kk) for kk in list_kout), 3 * len(kin_new))
    # 1e-10 gate: selection + lininterp re-gridding equals the hand-built op
    from scipy.linalg import block_diag
    sel0 = np.flatnonzero((kout >= 0.02) & (kout <= 0.2))
    rows = np.concatenate([sel0, len(kout) + sel0])
    manual = state['value'].T[rows] @ block_diag(
        *[interop.matrix_lininterp(kin_new, kin)] * 3)
    np.testing.assert_allclose(matrix, manual, rtol=0, atol=1e-10)
    np.testing.assert_allclose(wsn, np.concatenate([np.full(len(sel0), 1.),
                                                    np.full(len(sel0), 0.9)]), atol=1e-12)


def test_windowed_theory_with_external_matrix_and_wshotnoise():
    kin = np.geomspace(1e-3, 0.5, 200)
    kout = np.arange(0.005, 0.3, 0.005) + 0.0025
    state = make_window_state(kin, kout, ellsin=(0, 2), ellsout=(0, 2))
    sn = 2000.
    w = WindowedPowerSpectrumMultipoles(
        klim={0: (0.02, 0.2), 2: (0.02, 0.2)}, wmatrix=state, shotnoise=sn,
        theory=KaiserTracerPowerSpectrumMultipoles())
    pipe = Pipeline(w)
    pipe.evaluate({'b1': 2.})
    flat = np.asarray(w.flatpower)
    # manual: W @ theory - sn * (delta_l0 - wshotnoise)
    theory = np.asarray(w.theory.power).reshape(-1)
    sel = np.flatnonzero((kout >= 0.02) & (kout <= 0.2))
    rows = np.concatenate([sel, len(kout) + sel])
    W = state['value'].T[rows]
    base = np.concatenate([np.full(len(sel), 1.), np.zeros(len(sel))])
    wsn = np.concatenate([np.full(len(sel), 1.), np.full(len(sel), 0.9)])
    manual = W @ theory - sn * (base - wsn)
    np.testing.assert_allclose(flat, manual, rtol=2e-5)


def test_correlation_multipoles_reader():
    s = np.linspace(20., 180., 41)
    corr = np.array([0.01 * np.exp(-(s - 100.) ** 2 / 200.), -0.002 * np.ones_like(s)])
    meas = interop.read_correlation_multipoles({'s': s, 'corr': corr, 'ells': [0, 2]})
    assert meas['ells'] == (0, 2)
    np.testing.assert_allclose(meas['corr'], corr)


def test_load_source_chain(tmp_path):
    from desilike_tpu.samples.chain import Chain
    rng = np.random.default_rng(1)
    chain = Chain()
    chain['a'] = rng.normal(1., 0.1, (500, 4))
    chain['b'] = rng.normal(-2., 0.3, (500, 4))
    chain['logposterior'] = -0.5 * ((chain['a'] - 1.) / 0.1) ** 2
    fn = tmp_path / 'chain.npz'
    chain.save(fn)
    mean = interop.load_source(str(fn))
    assert mean['a'] == pytest.approx(1., abs=0.02)
    best = interop.load_source(chain, choice={'index': 'argmax'})
    assert best['a'] == pytest.approx(float(np.ravel(chain['a'])[np.argmax(np.ravel(chain['logposterior']))]))
    names, cov = interop.load_source(chain, cov=True, params=['a', 'b'])
    assert cov.shape == (2, 2) and cov[0, 0] == pytest.approx(0.01, rel=0.2)


def test_end_to_end_file_workflow(tmp_path):
    """data.npy + mock_*.npy + wmatrix.npy -> likelihood: the window output
    grid is rebin-matched (factorout search) to the data grid."""
    from desilike_tpu.likelihoods import ObservablesGaussianLikelihood
    k = np.arange(0.005, 0.3, 0.005) + 0.0025
    for i in range(60):
        np.save(tmp_path / 'mock_{:d}.npy'.format(i), make_pypower_state(k, seed=i)[0])
    np.save(tmp_path / 'data.npy', make_pypower_state(k, seed=99)[0])
    kin = np.geomspace(1e-3, 0.5, 300)
    np.save(tmp_path / 'wmatrix.npy', make_window_state(kin, k, ellsin=(0, 2), ellsout=(0, 2)))
    obs = TracerPowerSpectrumMultipolesObservable(
        data=str(tmp_path / 'data.npy'),
        covariance=[str(tmp_path / 'mock_*.npy')],
        wmatrix=str(tmp_path / 'wmatrix.npy'),
        klim={0: (0.02, 0.2, 0.01), 2: (0.02, 0.2, 0.01)},
        theory=KaiserTracerPowerSpectrumMultipoles())
    like = ObservablesGaussianLikelihood(observables=[obs])
    fn = like.logpost_fn()
    names = like.pipeline.varied_params.names()
    vals = {n: jnp.asarray(like.pipeline.params[n].value) for n in names}
    lp, _ = fn(vals)
    assert np.isfinite(float(lp))
    assert obs.nmocks == 60 and obs.flatdata.size == 36
    assert like.hartlap < 1.
    assert obs.wmatrix.shotnoise == pytest.approx(1234.)
    # window output bins rebinned 0.005 -> 0.01 and matched to the data grid
    assert np.allclose(np.diff(obs.k[0]), 0.01)


def test_cubic_transform():
    """transform='cubic' gaussianization (reference power_spectrum.py:402,
    arXiv:2302.07484 eq. 16): identity at theory == data, exact algebra off
    it, and rejected values raise."""
    import jax.numpy as jnp
    from desilike_tpu.core import Pipeline
    from desilike_tpu.theories import (DampedBAOWigglesTracerPowerSpectrumMultipoles,
                                       BAOPowerSpectrumTemplate)
    from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable

    def build(transform):
        theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(
            ells=(0,), template=BAOPowerSpectrumTemplate(z=0.8, apmode='qiso'))
        return TracerPowerSpectrumMultipolesObservable(
            data={'qiso': 1.0, 'b1': 2.0}, klim={0: (0.05, 0.2, 0.01)},
            theory=theory, transform=transform)

    obs = build('cubic')
    pipe = Pipeline(obs)
    pipe.evaluate({'qiso': 1.0, 'b1': 2.0})
    # T == D -> (3*1 - 2) * D == D
    np.testing.assert_allclose(np.asarray(obs.flattheory), obs.flatdata, rtol=1e-5)
    pipe.evaluate({'qiso': 1.02, 'b1': 2.1})
    got = np.asarray(obs.flattheory)
    raw_obs = build(None)
    pipe2 = Pipeline(raw_obs)
    pipe2.evaluate({'qiso': 1.02, 'b1': 2.1})
    raw = np.asarray(raw_obs.flattheory)
    d = np.asarray(obs.flatdata)
    np.testing.assert_allclose(got, (3. * (raw / d) ** (1. / 3.) - 2.) * d, rtol=2e-5)
    assert not np.allclose(got, raw, rtol=1e-4)
    with pytest.raises(ValueError):
        Pipeline(build('quartic'))  # initialization is lazy
