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
    """Parametric turn-over template (arXiv:2302.07484; ref
    power_template.py:1298): P = P_TO^(1 - m x^2) above / ^(1 - n x^2)
    below the turn-over, x = log10(k)/log10(kTO) - 1."""
    tpl = TurnOverPowerSpectrumTemplate(z=0.5, k=np.geomspace(3e-3, 0.3, 300))
    tpl.pipeline.evaluate({})
    assert 0.005 < tpl.kto_fid < 0.03
    tpl.pipeline.evaluate({'qto': 1.1, 'dpto': 1.05, 'm': 0.6, 'n': 0.9})
    pk = np.asarray(tpl.pk_dd)
    imax = np.argmax(pk)
    # the parametric form peaks exactly at kTO = qto * kTO_fid ...
    assert tpl.k[imax] == pytest.approx(tpl.kto_fid * 1.1, rel=0.05)
    # ... with height P_TO = dpto * P_TO_fid
    assert pk[imax] == pytest.approx(tpl.pkto_fid * 1.05, rel=1e-2)
    # under apmode='qap' with eta=1/3, qiso == 1: DV kTO stays fiducial
    assert float(tpl.DV_times_kTO) == pytest.approx(tpl.DV_times_kTO_fid, rel=1e-5)
    # shape exponents act on their own side of the turn-over
    tpl.pipeline.evaluate({'qto': 1.1, 'dpto': 1.05, 'm': 1.2, 'n': 0.9})
    pk_steep = np.asarray(tpl.pk_dd)
    x = np.log10(tpl.k) / np.log10(tpl.kto_fid * 1.1) - 1.
    above, below = x < 0, x > 0.05  # x<0 is the high-k side (log10 kTO < 0)
    assert not np.allclose(pk_steep[below], pk[below], rtol=1e-3)
    np.testing.assert_allclose(pk_steep[above], pk[above], rtol=1e-6)


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


def test_cosmology_alternative_parameterizations():
    """Reference/cosmoprimo alternative cosmology inputs (ref
    power_template.yaml extractors declare Omega_m/N_eff/w0_fld/wa_fld;
    lya declares alpha_s): declared in init.params, they convert internally
    and match the canonical-basis result exactly."""
    from desilike_tpu.theories import Cosmology, BAOExtractor
    from desilike_tpu.theories.cosmology import TNCDM_NEFF
    from desilike_tpu.core import Pipeline

    cosmo = Cosmology()
    cosmo.init.params = {'Omega_m': dict(value=0.3153, prior=dict(limits=[0.01, 1.]), fixed=False)}
    ex = BAOExtractor(cosmo=cosmo, z=0.8)
    pipe = Pipeline(ex)
    pipe.evaluate({'Omega_m': 0.35})
    q_alias = float(ex.qiso)

    cosmo2 = Cosmology()
    cosmo2.init.params = {'omega_cdm': dict(fixed=False)}
    ex2 = BAOExtractor(cosmo=cosmo2, z=0.8)
    h, ob, mn = 0.6736, 0.02237, 0.06
    Pipeline(ex2).evaluate({'omega_cdm': 0.35 * h ** 2 - ob - mn / 93.14})
    assert abs(float(ex2.qiso) - q_alias) < 1e-6

    for alias, canon, val, conv in [('w0_fld', 'w0_fde', -0.9, lambda v: v),
                                    ('N_eff', 'N_ur', 3.4, lambda v: v - TNCDM_NEFF)]:
        ca = Cosmology(); ca.init.params = {alias: dict(value=val, fixed=False)}
        ea = BAOExtractor(cosmo=ca, z=0.8)
        Pipeline(ea).evaluate({alias: val})
        cb = Cosmology(); cb.init.params = {canon: dict(fixed=False)}
        eb = BAOExtractor(cosmo=cb, z=0.8)
        Pipeline(eb).evaluate({canon: conv(val)})
        assert abs(float(ea.qiso) - float(eb.qiso)) < 1e-9

    # alpha_s running: exact exp(0.5 alpha_s ln^2(k/kp)) tilt of pk
    from desilike_tpu.cosmology.linear import KPIVOT_MPC
    c = Cosmology()
    c.init.params = {'alpha_s': dict(value=0., prior=dict(limits=[-0.1, 0.1]), fixed=False)}
    pipe = Pipeline(c)
    k = np.geomspace(1e-3, 1., 64)
    pipe.evaluate({'alpha_s': 0.})
    p0 = np.asarray(c.pk_dd(k, 0.))
    pipe.evaluate({'alpha_s': 0.05})
    p1 = np.asarray(c.pk_dd(k, 0.))
    np.testing.assert_allclose(p1 / p0, np.exp(0.5 * 0.05 * np.log(k / (KPIVOT_MPC / 0.6736)) ** 2), rtol=1e-5)


def test_png_reference_modes():
    """PNG modes and names per the reference (primordial_non_gaussianity.py
    :58-66): 'b-p' (fnl_loc + p), 'bphi' (fnl_loc + bphi), 'bfnl'
    (bfnl_loc = b_phi f_NL directly) give identical power when consistent."""
    from desilike_tpu.theories import PNGTracerPowerSpectrumMultipoles, ShapeFitPowerSpectrumTemplate
    from desilike_tpu.core import Pipeline
    k = np.linspace(0.003, 0.1, 30)

    png = PNGTracerPowerSpectrumMultipoles(k=k, ells=(0,), template=ShapeFitPowerSpectrumTemplate(z=1.))
    pp = Pipeline(png)
    assert 'fnl_loc' in set(pp.params.basenames()) and 'bphi' not in set(pp.params.basenames())
    a1 = np.asarray(pp.evaluate({'fnl_loc': 50., 'b1': 2.}))[0]

    png_b = PNGTracerPowerSpectrumMultipoles(k=k, ells=(0,), mode='bfnl',
                                             template=ShapeFitPowerSpectrumTemplate(z=1.))
    ppb = Pipeline(png_b)
    assert 'bfnl_loc' in set(ppb.params.basenames()) and 'fnl_loc' not in set(ppb.params.basenames())
    b1 = np.asarray(ppb.evaluate({'bfnl_loc': 2 * 1.686 * 1. * 50., 'b1': 2.}))[0]
    np.testing.assert_allclose(b1, a1, rtol=1e-6)

    png_c = PNGTracerPowerSpectrumMultipoles(k=k, ells=(0,), mode='bphi',
                                             template=ShapeFitPowerSpectrumTemplate(z=1.))
    c1 = np.asarray(Pipeline(png_c).evaluate({'fnl_loc': 50., 'bphi': 2 * 1.686, 'b1': 2.}))[0]
    np.testing.assert_allclose(c1, a1, rtol=1e-6)


def test_resummed_bao_d_parameter():
    """Resummed BAO declares the growth-scaling d (fixed at 1) and drops the
    Gaussian sigmapar/sigmaper of the damped model, per reference bao.yaml."""
    from desilike_tpu.theories import (ResummedBAOWigglesTracerPowerSpectrumMultipoles,
                                       BAOPowerSpectrumTemplate)
    from desilike_tpu.core import Pipeline
    res = ResummedBAOWigglesTracerPowerSpectrumMultipoles(
        ells=(0, 2), k=np.linspace(0.02, 0.3, 29), template=BAOPowerSpectrumTemplate(z=0.8))
    pipe = Pipeline(res)
    bn = set(pipe.params.basenames())
    assert 'd' in bn and 'sigmapar' not in bn and 'sigmaper' not in bn
    p1 = np.asarray(pipe.evaluate({'b1': 1.8}))
    p2 = np.asarray(pipe.evaluate({'b1': 1.8, 'd': 1.5}))
    assert not np.allclose(p1, p2)
