import numpy as np
import jax.numpy as jnp
import pytest

from desilike_tpu.theories import (WiggleSplitPowerSpectrumTemplate,
                                   BandVelocityPowerSpectrumTemplate,
                                   TurnOverPowerSpectrumTemplate)


def test_wigglesplit():
    tpl = WiggleSplitPowerSpectrumTemplate(z=1., k=np.geomspace(1e-3, 0.6, 300))
    tpl.pipeline.evaluate({'qbao': 1.0, 'dm': 0., 'df': 1.})
    pk0 = np.asarray(tpl.pk_dd)
    np.testing.assert_allclose(pk0, np.asarray(tpl.pk_dd_fid), rtol=2e-3)
    tpl.pipeline.evaluate({'qbao': 1.05, 'dm': 0., 'df': 1.})
    pk1 = np.asarray(tpl.pk_dd)
    # wiggles moved, broadband preserved: no-wiggle part unchanged
    np.testing.assert_allclose(np.asarray(tpl.pknow_dd), np.asarray(tpl.pknow_dd_fid), rtol=2e-3)
    assert not np.allclose(pk1, pk0, rtol=1e-3)


def test_bandvelocity():
    kp = np.array([0.02, 0.05, 0.1, 0.2])
    tpl = BandVelocityPowerSpectrumTemplate(z=1., kp=kp, k=np.geomspace(5e-3, 0.4, 200))
    names = tpl.pipeline.varied_params.names()
    assert 'dptt0' in names and 'dptt3' in names
    tpl.pipeline.evaluate({'dptt1': 1.2})
    ratio = np.asarray(tpl.pk_dd) / np.asarray(tpl.pk_dd_fid)
    i = np.argmin(np.abs(tpl.k - 0.05))
    assert ratio[i] == pytest.approx(1.2, rel=5e-3)
    j = np.argmin(np.abs(tpl.k - 0.3))
    assert ratio[j] == pytest.approx(1.0, rel=5e-3)


def test_turnover():
    tpl = TurnOverPowerSpectrumTemplate(z=0.5, k=np.geomspace(3e-3, 0.3, 300))
    tpl.pipeline.evaluate({})
    assert 0.005 < tpl.kto_fid < 0.03
    tpl.pipeline.evaluate({'qto': 1.1, 'pto': 1.05})
    pk = np.asarray(tpl.pk_dd)
    imax = np.argmax(pk)
    kto_meas = tpl.k[imax]
    assert kto_meas == pytest.approx(tpl.kto_fid * 1.1, rel=0.08)
    assert float(tpl.DV_times_kTO) == pytest.approx(tpl.DV_fid * tpl.kto_fid * 1.1, rel=1e-5)


def test_bao_phaseshift():
    from desilike_tpu.theories import BAOPhaseShiftPowerSpectrumTemplate
    tpl = BAOPhaseShiftPowerSpectrumTemplate(z=0.8, k=np.geomspace(1e-3, 0.6, 400), apmode='qiso')
    tpl.pipeline.evaluate({'baoshift': 1.0})
    pk0 = np.asarray(tpl.pk_dd)
    np.testing.assert_allclose(pk0, np.asarray(tpl.pk_dd_fid), rtol=1e-3)
    tpl.pipeline.evaluate({'baoshift': 2.0})
    pk1 = np.asarray(tpl.pk_dd)
    k = tpl.k
    m = (k > 0.05) & (k < 0.3)
    # wiggles shift but no-wiggle part unchanged
    assert not np.allclose(pk1[m], pk0[m], rtol=1e-3)
    np.testing.assert_allclose(np.asarray(tpl.pknow_dd), np.asarray(tpl.pknow_dd_fid), rtol=1e-6)


def test_chain_to_fisher_roundtrip():
    from desilike_tpu.samples.chain import Chain
    rng = np.random.default_rng(0)
    mean = np.array([1., -2.])
    cov = np.array([[0.04, 0.01], [0.01, 0.09]])
    pts = rng.multivariate_normal(mean, cov, size=20000)
    chain = Chain({'x': pts[:, 0], 'y': pts[:, 1]})
    lf = chain.to_fisher(['x', 'y'])
    np.testing.assert_allclose(lf.center, mean, atol=0.02)
    np.testing.assert_allclose(lf.covariance(), cov, rtol=0.05, atol=1e-3)


def test_chain_getdist_roundtrip(tmp_path):
    from desilike_tpu.samples.chain import Chain
    rng = np.random.default_rng(1)
    chain = Chain({'x': rng.normal(size=100), 'logposterior': -rng.random(100)})
    chain.write_getdist(str(tmp_path / 'c'))
    loaded = Chain.from_getdist(str(tmp_path / 'c'))
    np.testing.assert_allclose(np.asarray(loaded['x']), np.asarray(chain['x']), rtol=1e-5)


def test_direct_wiggle_split_template():
    """DirectWiggleSplit: qbao moves only the wiggles; sigmabao damps them;
    qbao=1, sigmabao=0 reduces to the Direct template (reference
    power_template.py:1346)."""
    from desilike_tpu.theories import DirectWiggleSplitPowerSpectrumTemplate, DirectPowerSpectrumTemplate
    from desilike_tpu.core import Pipeline
    k = np.logspace(-2.2, -0.3, 200)
    tmpl = DirectWiggleSplitPowerSpectrumTemplate(k=k, z=1.)
    pipe = Pipeline(tmpl)
    pipe.evaluate({})
    base = np.asarray(tmpl.pk_dd)
    nowig = np.asarray(tmpl.pknow_dd)
    ref = DirectPowerSpectrumTemplate(k=k, z=1.)
    Pipeline(ref).evaluate({})
    np.testing.assert_allclose(base, np.asarray(ref.pk_dd), rtol=1e-4)
    # qbao moves the wiggles, leaves the broadband untouched
    pipe.evaluate({'qbao': 1.05})
    moved = np.asarray(tmpl.pk_dd)
    np.testing.assert_allclose(np.asarray(tmpl.pknow_dd), nowig, rtol=1e-6)
    assert not np.allclose(moved, base, rtol=1e-3)
    # strong damping kills the wiggles entirely
    pipe.evaluate({'sigmabao': 50.})
    damped = np.asarray(tmpl.pk_dd)
    inner = (k > 0.05) & (k < 0.3)
    np.testing.assert_allclose(damped[inner], nowig[inner], rtol=1e-3)
    # cosmology response still flows through (direct template underneath)
    pipe.evaluate({'omega_cdm': 0.13})
    assert not np.allclose(np.asarray(tmpl.pk_dd), base, rtol=1e-3)
