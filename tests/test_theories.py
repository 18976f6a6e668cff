import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.theories import (
    DampedBAOWigglesTracerPowerSpectrumMultipoles, BAOPowerSpectrumTemplate,
    ShapeFitPowerSpectrumTemplate, DampedBAOWigglesTracerCorrelationFunctionMultipoles,
    APEffect)


def test_ap_effect_modes():
    for mode, params in [('qparqper', {'qpar': 1.02, 'qper': 0.98}),
                         ('qiso', {'qiso': 1.01}),
                         ('qisoqap', {'qiso': 1.01, 'qap': 1.02})]:
        ap = APEffect(mode=mode, z=1.)
        ap.pipeline.evaluate(params)
        assert np.isfinite(float(ap.qpar)) and np.isfinite(float(ap.qper))
        if mode == 'qiso':
            assert float(ap.qpar) == pytest.approx(1.01)
            assert float(ap.qap) == pytest.approx(1.)


def test_ap_remap():
    from desilike_tpu.theories import ap_k_mu
    k = jnp.linspace(0.01, 0.2, 10)
    mu = jnp.linspace(0., 1., 5)
    jac, kap, muap = ap_k_mu(k, mu, qpar=1., qper=1.)
    np.testing.assert_allclose(np.asarray(kap), np.asarray(k)[:, None] * np.ones(5), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(muap), mu, rtol=1e-6)
    jac, kap, muap = ap_k_mu(k, mu, qpar=1.1, qper=0.9)
    assert float(jac) == pytest.approx(1. / (1.1 * 0.81))
    # mu=1 -> pure parallel: k -> k/qpar
    np.testing.assert_allclose(np.asarray(kap)[:, -1], np.asarray(k) / 1.1, rtol=1e-5)


def test_bao_template_derived():
    tpl = BAOPowerSpectrumTemplate(z=0.8)
    tpl.pipeline.evaluate({'qpar': 1.02, 'qper': 0.99})
    assert float(tpl.DH_over_rd) == pytest.approx(1.02 * tpl.DH_over_rd_fid, rel=1e-5)
    assert float(tpl.DM_over_rd) == pytest.approx(0.99 * tpl.DM_over_rd_fid, rel=1e-5)


def test_shapefit_template_tilt():
    tpl = ShapeFitPowerSpectrumTemplate(z=1.)
    tpl.pipeline.evaluate({'dm': 0.})
    pk0 = np.asarray(tpl.pk_dd)
    tpl.pipeline.evaluate({'dm': 0.1})
    pk1 = np.asarray(tpl.pk_dd)
    k = tpl.k
    ratio = pk1 / pk0
    # tilt: suppressed below pivot, enhanced above
    assert ratio[k < 0.005].max() < 1.
    assert ratio[k > 0.2].min() > 1.
    # slope at pivot ~ dm (d ln ratio / d ln k at kp)
    i = np.searchsorted(k, 0.03)
    slope = np.log(ratio[i + 1] / ratio[i - 1]) / np.log(k[i + 1] / k[i - 1])
    assert slope == pytest.approx(0.1, rel=0.05)


def test_damped_bao_models():
    for model in ('standard', 'fog-damping', 'move-all', 'fix-damping'):
        theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(
            ells=(0, 2), model=model, k=np.linspace(0.02, 0.3, 29))
        power = np.asarray(theory.pipeline.evaluate({'b1': 2.0}))
        assert power.shape == (2, 29)
        assert np.all(np.isfinite(power))
        assert np.all(power[0] > 0)  # monopole positive


def test_bao_isotropic_shift():
    """qiso shifts the BAO wiggle positions."""
    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(
        ells=(0,), k=np.linspace(0.05, 0.3, 200),
        template=BAOPowerSpectrumTemplate(apmode='qiso'))
    p1 = np.asarray(theory.pipeline.evaluate({'qiso': 1.0, 'b1': 2.0}))[0]
    p2 = np.asarray(theory.pipeline.evaluate({'qiso': 1.05, 'b1': 2.0}))[0]
    # wiggle component shifts: cross-correlate residuals
    assert not np.allclose(p1, p2, rtol=1e-3)


def test_broadband_linear():
    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=(0,), k=np.linspace(0.02, 0.3, 29))
    pipe = theory.pipeline
    p0 = np.asarray(pipe.evaluate({'al0_0': 0.}))
    p1 = np.asarray(pipe.evaluate({'al0_0': 1.}))
    p2 = np.asarray(pipe.evaluate({'al0_0': 2.}))
    np.testing.assert_allclose(p2 - p1, p1 - p0, rtol=1e-4, atol=1e-5)  # exactly linear


def test_bao_correlation_function():
    theory = DampedBAOWigglesTracerCorrelationFunctionMultipoles(
        ells=(0, 2), s=np.linspace(30., 150., 41))
    corr = np.asarray(theory.pipeline.evaluate({'b1': 2.0}))
    assert corr.shape == (2, 41)
    assert np.all(np.isfinite(corr))
    s = theory.s
    s2xi = s ** 2 * corr[0]
    # BAO peak visible around s ~ 100 Mpc/h: s^2 xi has local max in [80, 115]
    peak_region = s2xi[(s > 80) & (s < 115)]
    outside = s2xi[(s > 125)]
    assert peak_region.max() > outside.max()


def test_bao_correlation_function_nontracer():
    """Wiggle-only (non-tracer) xi classes (reference bao.py:766-857): no
    broadband parameters, and at default parameters they match the tracer
    wrapper (whose broadband coefficients default to 0)."""
    from desilike_tpu.theories import (DampedBAOWigglesCorrelationFunctionMultipoles,
                                       ResummedBAOWigglesCorrelationFunctionMultipoles)
    s = np.linspace(30., 150., 41)
    plain = DampedBAOWigglesCorrelationFunctionMultipoles(ells=(0, 2), s=s)
    assert not any(p.basename.startswith('al') for p in plain.pipeline.params)
    corr = np.asarray(plain.pipeline.evaluate({'b1': 2.0}))
    tracer = DampedBAOWigglesTracerCorrelationFunctionMultipoles(ells=(0, 2), s=s)
    ref = np.asarray(tracer.pipeline.evaluate({'b1': 2.0}))
    np.testing.assert_allclose(corr, ref, rtol=1e-6)
    resummed = ResummedBAOWigglesCorrelationFunctionMultipoles(ells=(0,), s=s)
    rc = np.asarray(resummed.pipeline.evaluate({'b1': 2.0}))
    assert rc.shape == (1, 41) and np.isfinite(rc).all()


def test_jit_consistency():
    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=(0,), k=np.linspace(0.02, 0.3, 29))
    pipe = theory.pipeline
    eager = np.asarray(pipe.evaluate({'qpar': 1.01, 'b1': 1.9}))
    fn = pipe.get_fn()
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    jitted = np.asarray(fn({**vals, 'qpar': jnp.asarray(1.01), 'b1': jnp.asarray(1.9)}))
    np.testing.assert_allclose(eager, jitted, rtol=1e-5)


def test_des_y3_wrapper_gated():
    """DESY3Theory: parameter map is complete; import-gated on cosmosis
    (reference theories/weak_lensing/des_y3.py:6)."""
    import pytest
    from desilike_tpu.theories import DESY3Theory, DES_Y3_PARAM_MAP
    assert DES_Y3_PARAM_MAP['omega_cdm'] == ('cosmological_parameters', 'omch2')
    assert DES_Y3_PARAM_MAP['bias_lens_b3'] == ('bias_lens', 'b3')
    assert DES_Y3_PARAM_MAP['intrinsic_alignment_parameters_a1'] == ('intrinsic_alignment_parameters', 'a1')
    assert len(DES_Y3_PARAM_MAP) >= 50
    th = DESY3Theory(ini_file_dir='.', ini_file_name='none.ini', cosmosis_dir='.')
    with pytest.raises(ImportError, match='cosmosis'):
        th.runtime_info.initialize()
