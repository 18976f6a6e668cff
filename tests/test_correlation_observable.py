"""Correlation-function observable + xi covariance + joint pk-xi."""
import numpy as np
import jax.numpy as jnp
import pytest

from desilike_tpu.theories import (DampedBAOWigglesTracerCorrelationFunctionMultipoles,
                                   BAOPowerSpectrumTemplate)
from desilike_tpu.observables import (TracerCorrelationFunctionMultipolesObservable,
                                      BoxFootprint, ObservablesCovarianceMatrix)
from desilike_tpu.likelihoods import ObservablesGaussianLikelihood


def make_xi_observable():
    theory = DampedBAOWigglesTracerCorrelationFunctionMultipoles(
        ells=(0, 2), template=BAOPowerSpectrumTemplate(z=0.8, apmode='qiso'))
    theory.init.params = {'al*': dict(derived='.marg')}
    return TracerCorrelationFunctionMultipolesObservable(
        data={'b1': 2.0}, slim={0: (40., 140., 5.), 2: (40., 140., 5.)}, theory=theory)


def test_xi_covariance_and_likelihood():
    obs = make_xi_observable()
    footprint = BoxFootprint(volume=2e9, nbar=5e-4)
    cov = ObservablesCovarianceMatrix(obs, footprints=[footprint])(b1=2.0)
    n = sum(len(ss) for ss in obs.s)
    assert cov.shape == (n, n)
    assert np.all(np.diag(cov) > 0)
    ev = np.linalg.eigvalsh(cov)
    assert ev.min() > -1e-10 * ev.max()  # positive semi-definite
    like = ObservablesGaussianLikelihood(observables=[obs], covariance=cov)
    fn = like.logpost_fn()
    pipe = like.pipeline
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    vals['b1'] = jnp.asarray(2.0)
    lp0, _ = fn(vals)
    lp1, _ = fn({**vals, 'qiso': jnp.asarray(1.05)})
    assert np.isfinite(float(lp0)) and float(lp1) < float(lp0)


def test_xi_sigma_sanity():
    """xi covariance diagonal should give few-percent errors on s^2 xi at BAO scales
    for a DESI-like volume."""
    obs = make_xi_observable()
    footprint = BoxFootprint(volume=2e9, nbar=5e-4)
    cov = ObservablesCovarianceMatrix(obs, footprints=[footprint])(b1=2.0)
    sig = np.sqrt(np.diag(cov))[:len(obs.s[0])]
    data = obs.data[0]
    snr = np.abs(data) / sig
    assert snr.max() > 3.  # BAO-scale xi measured at high significance


def test_explicit_window_matrix_path():
    """User-provided window matrix (kin, W) path of WindowedPowerSpectrumMultipoles."""
    from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable
    from desilike_tpu.theories import DampedBAOWigglesTracerPowerSpectrumMultipoles
    kobs = np.linspace(0.025, 0.195, 18)
    kin = np.linspace(0.005, 0.35, 70)
    # smearing window: each output bin averages neighboring theory bins
    W1 = np.zeros((18, 70))
    for i, kv in enumerate(kobs):
        w = np.exp(-0.5 * ((kin - kv) / 0.01) ** 2)
        W1[i] = w / w.sum()
    W = np.zeros((36, 140))
    W[:18, :70] = W1
    W[18:, 70:] = W1
    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=(0, 2))
    obs = TracerPowerSpectrumMultipolesObservable(
        data={'b1': 2.0}, k=kobs, ells=(0, 2), wmatrix=(kin, W), theory=theory)
    obs.runtime_info.initialize()
    assert obs.flatdata.shape == (36,)
    from desilike_tpu.core import Pipeline
    Pipeline(obs).evaluate({'b1': 2.0, 'qpar': 1.01})
    assert np.all(np.isfinite(np.asarray(obs.flattheory)))
    # windowed theory equals the explicit matrix application
    direct = np.asarray(obs.wmatrix.theory.power)
    smoothed = np.asarray(obs.flattheory)[:18]
    expected = W1 @ direct[0]
    np.testing.assert_allclose(smoothed, expected, rtol=1e-4)
    # and is a mild smoothing of the pointwise theory
    interp = np.interp(kobs, kin, direct[0])
    assert np.max(np.abs(smoothed - interp) / np.abs(interp)) < 0.15


def test_rr_count_window():
    """RR-count window (reference window.py:71): uniform full-mu RR counts
    reduce to plain bin-integration; mu-truncated RR mixes multipoles."""
    import numpy as np
    from desilike_tpu.observables.window import (window_matrix_RR, window_matrix_bininteg,
                                                 WindowedCorrelationFunctionMultipoles)
    sedges = np.arange(20., 160.1, 4.)
    muedges = np.linspace(0., 1., 101)
    # realistic randoms: RR counts proportional to the shell volume
    vol = (sedges[1:] ** 3 - sedges[:-1] ** 3)
    wc_uniform = np.broadcast_to(vol[:, None], (len(sedges) - 1, len(muedges) - 1)).copy()
    soutedges = {}
    for ell in (0, 2):
        e = np.arange(40., 120.1, 8.)
        soutedges[ell] = np.column_stack([e[:-1], e[1:]])
    sin, W = window_matrix_RR(soutedges, sedges, muedges, wc_uniform, ellsin=(0, 2), resolution=2)
    # reference comparison: pure bin-integration on the same fine grid
    sin2, B = window_matrix_bininteg([soutedges[0], soutedges[2]], resolution=8)
    xi0 = 1. / (1. + (sin / 60.) ** 2)
    xi2 = -0.5 * xi0
    flat_in = np.concatenate([xi0, xi2])
    out_rr = W @ flat_in
    xi0b = 1. / (1. + (sin2 / 60.) ** 2)
    flat_in2 = np.concatenate([xi0b, -0.5 * xi0b])
    out_bin = B @ flat_in2
    np.testing.assert_allclose(out_rr, out_bin, rtol=1e-3)
    # truncated mu coverage -> quadrupole leaks into the monopole rows
    wc_cut = wc_uniform.copy()
    wc_cut[:, muedges[1:] > 0.8] = 0.
    _, Wcut = window_matrix_RR(soutedges, sedges, muedges, wc_cut, ellsin=(0, 2), resolution=2)
    n0 = len(soutedges[0])
    nsin = len(sin)
    cross_block = Wcut[:n0, nsin:]
    assert np.abs(cross_block).max() > 1e-3
    # end-to-end: the windowed xi accepts the RR spec
    w = WindowedCorrelationFunctionMultipoles(
        slim={0: (40., 120., 8.), 2: (40., 120., 8.)},
        wmatrix=dict(sedges=sedges, muedges=muedges, wcounts=wc_cut, ellsin=(0, 2)))
    flat = np.asarray(w.pipeline.evaluate({'b1': 2.0}))
    assert flat.shape == (20,) and np.isfinite(flat).all()
