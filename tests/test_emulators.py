"""Taylor and MLP emulators as drop-in graph nodes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.theories import ShapeFitPowerSpectrumTemplate, DampedBAOWigglesTracerPowerSpectrumMultipoles, BAOPowerSpectrumTemplate
from desilike_tpu.emulators import Emulator, TaylorEmulatorEngine, MLPEmulatorEngine


def test_taylor_emulator_template():
    tpl = ShapeFitPowerSpectrumTemplate(z=0.8, k=np.geomspace(1e-3, 0.5, 120))
    emu = Emulator(tpl, engine=TaylorEmulatorEngine(order=3)).fit()
    assert 'pk_dd' in emu.varied_names
    err = emu.check(ntests=5)
    assert err < 5e-3, err


def test_taylor_emulated_node_drop_in():
    """Emulated template slots into a BAO theory pipeline."""
    tpl = BAOPowerSpectrumTemplate(z=0.8, apmode='qiso')
    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(
        ells=(0,), k=np.linspace(0.02, 0.3, 29), template=tpl)
    pipe = theory.pipeline
    exact = np.asarray(pipe.evaluate({'qiso': 1.01, 'b1': 2.0, 'dbeta': 1.05}))

    emu_tpl = Emulator(tpl, engine=TaylorEmulatorEngine(order=3)).fit().to_calculator()
    theory2 = DampedBAOWigglesTracerPowerSpectrumMultipoles(
        ells=(0,), k=np.linspace(0.02, 0.3, 29), template=emu_tpl)
    approx = np.asarray(theory2.pipeline.evaluate({'qiso': 1.01, 'b1': 2.0, 'dbeta': 1.05}))
    np.testing.assert_allclose(approx, exact, rtol=2e-2)
    # jit-safe
    fn = theory2.pipeline.get_fn()
    vals = {p.name: jnp.asarray(p.value) for p in theory2.pipeline.varied_params}
    out = np.asarray(fn(vals))
    assert np.all(np.isfinite(out))


def test_mlp_emulator():
    tpl = ShapeFitPowerSpectrumTemplate(z=0.8, k=np.geomspace(1e-3, 0.5, 80))
    eng = MLPEmulatorEngine(hidden=(32, 32), nsamples=128, nsteps=800)
    emu = Emulator(tpl, engine=eng).fit()
    err = emu.check(ntests=5)
    assert err < 0.05, err


def test_taylor_emulator_save_load(tmp_path):
    from desilike_tpu.emulators import Emulator, TaylorEmulatorEngine
    tpl = BAOPowerSpectrumTemplate(z=0.8, apmode='qiso')
    emu = Emulator(tpl, engine=TaylorEmulatorEngine(order=2)).fit()
    fn = tmp_path / 'emu.npz'
    emu.save(fn)
    tpl2 = BAOPowerSpectrumTemplate(z=0.8, apmode='qiso')
    emu2 = Emulator.load(str(fn), calculator=tpl2)
    theta = np.array([1.01])
    p1 = emu.predict(theta)
    p2 = emu2.predict(theta)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p2[k]), rtol=1e-6)
    node = emu2.to_calculator()
    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(
        ells=(0,), k=np.linspace(0.02, 0.3, 29), template=node)
    power = np.asarray(theory.pipeline.evaluate({'qiso': 1.01, 'b1': 2.0}))
    assert np.all(np.isfinite(power))
