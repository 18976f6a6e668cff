"""Injected-pk production path: ratio-corrected table engine + external-sample
MLP training (SURVEY.md §2.10; round-1 review item 4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.cosmology import background as bg
from desilike_tpu.cosmology import linear as lin
from desilike_tpu.theories.cosmology import Cosmology
from desilike_tpu.core import Pipeline


def fake_boltzmann_table(p, ktab):
    """Stand-in for a CLASS table: EH98 x a smooth 3% shape distortion
    (mimicking the EH98-vs-Boltzmann transfer error)."""
    pk = np.asarray(lin.pk_lin(p, jnp.asarray(ktab), 0.))
    distort = 1. + 0.03 * np.tanh(np.log(ktab / 0.05))
    return pk * distort


KTAB = np.geomspace(1e-4, 10., 512)
P_FID = bg.resolve({})
PK_TAB = fake_boltzmann_table(P_FID, KTAB)


def test_table_engine_exact_at_fiducial():
    cosmo = Cosmology(engine='table', pk_table=(KTAB, PK_TAB))
    pipe = Pipeline(cosmo)
    pipe.evaluate({})
    k = jnp.geomspace(1e-3, 1., 100)
    got = np.asarray(cosmo.pk_dd(k, 0.))
    expected = np.exp(np.interp(np.log(np.asarray(k)), np.log(KTAB), np.log(PK_TAB)))
    np.testing.assert_allclose(got, expected, rtol=2e-4)


def test_table_engine_exact_primordial_response():
    """A_s and n_s responses are EXACT (they factor out of the transfer)."""
    cosmo = Cosmology(engine='table', pk_table=(KTAB, PK_TAB), fixed=False)
    pipe = Pipeline(cosmo)
    k = jnp.geomspace(1e-3, 1., 50)
    pipe.evaluate({})
    base = np.asarray(cosmo.pk_dd(k, 0.))
    pipe.evaluate({'logA': P_FID['logA'] + np.log(1.2)})
    np.testing.assert_allclose(np.asarray(cosmo.pk_dd(k, 0.)), 1.2 * base, rtol=2e-4)
    # n_s tilt: ratio (k/kp)^dn with kp = 0.05/h
    dn = 0.01
    pipe.evaluate({'n_s': P_FID['n_s'] + dn})
    kp = 0.05 / P_FID['h']
    np.testing.assert_allclose(np.asarray(cosmo.pk_dd(k, 0.)),
                               base * (np.asarray(k) / kp) ** dn, rtol=2e-4)


def test_table_engine_shape_response_cancels_distortion():
    """The injected distortion must ride through a shape-parameter change
    unchanged (the EH98 ratio carries only the response)."""
    cosmo = Cosmology(engine='table', pk_table=(KTAB, PK_TAB), fixed=False)
    pipe = Pipeline(cosmo)
    k = jnp.geomspace(1e-3, 1., 50)
    shifted = {'omega_cdm': 0.125}
    pipe.evaluate(shifted)
    got = np.asarray(cosmo.pk_dd(k, 0.))
    p_shift = bg.resolve(dict(shifted))
    eh_ratio = np.asarray(lin.pk_lin(p_shift, k, 0.)) / np.asarray(lin.pk_lin(P_FID, k, 0.))
    distort = 1. + 0.03 * np.tanh(np.log(np.asarray(k) / 0.05))
    expected = np.asarray(lin.pk_lin(P_FID, k, 0.)) * distort * eh_ratio
    np.testing.assert_allclose(got, expected, rtol=1e-3)  # f32 transfer ratios


def test_direct_template_with_injected_table():
    """End-to-end differentiable direct-cosmology fit from an injected table."""
    from desilike_tpu.theories import KaiserTracerPowerSpectrumMultipoles
    from desilike_tpu.theories.power_template import DirectPowerSpectrumTemplate
    from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable, BoxFootprint
    from desilike_tpu.likelihoods import ObservablesGaussianLikelihood
    template = DirectPowerSpectrumTemplate(z=0.8, engine='table', pk_table=(KTAB, PK_TAB))
    theory = KaiserTracerPowerSpectrumMultipoles(ells=(0, 2), template=template)
    obs = TracerPowerSpectrumMultipolesObservable(
        data={'b1': 2.0}, klim={0: (0.02, 0.2, 0.01), 2: (0.02, 0.2, 0.01)}, theory=theory)
    like = ObservablesGaussianLikelihood(observables=[obs],
                                         footprints=[BoxFootprint(volume=2e9, nbar=5e-4)])
    fn = like.logpost_fn()
    names = like.pipeline.varied_params.names()
    assert 'omega_cdm' in names
    values = {n: jnp.asarray(like.pipeline.params[n].value) for n in names}
    values['b1'] = jnp.asarray(2.0)
    lp, _ = fn(values)
    assert float(lp) == pytest.approx(float(like.pipeline.logprior(
        like.pipeline._resolve_values(values))), abs=1e-2)
    g = jax.grad(lambda v: fn({**values, 'omega_cdm': v})[0])(jnp.asarray(0.12))
    assert np.isfinite(float(g)) and abs(float(g)) > 0.


def test_mlp_external_samples():
    """MLP emulator trained from EXTERNAL (theta, pk) pairs."""
    from desilike_tpu.emulators import Emulator
    from desilike_tpu.theories.power_template import DirectPowerSpectrumTemplate
    template = DirectPowerSpectrumTemplate(z=0.8, varied=('omega_cdm', 'logA'))
    template.runtime_info.initialize()
    emu = Emulator(template, engine='mlp', hidden=(32, 32), nsteps=800)
    # external training set: vary omega_cdm, logA; Y = flattened varied state
    rng = np.random.default_rng(0)
    X = np.column_stack([rng.uniform(0.11, 0.13, 64), rng.uniform(2.9, 3.2, 64)])
    fn = jax.jit(emu._state_fn())
    Y = np.array([np.asarray(fn(jnp.asarray(x))) for x in X])  # offline tables
    emu.set_samples(samples=(X, Y))
    emu.fit()
    pred = emu.predict(jnp.asarray([0.12, 3.05]))
    truth = np.asarray(fn(jnp.asarray([0.12, 3.05])))
    flat = np.concatenate([np.asarray(v).reshape(-1) for v in pred.values()])
    scale = np.maximum(np.abs(truth), np.abs(truth).max() * 1e-3)
    assert np.max(np.abs(flat - truth) / scale) < 0.1
