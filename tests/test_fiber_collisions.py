import numpy as np
import jax.numpy as jnp
import pytest

from desilike_tpu.theories.full_shape import KaiserTracerPowerSpectrumMultipoles
from desilike_tpu.theories import ShapeFitPowerSpectrumTemplate
from desilike_tpu.observables import (TopHatFiberCollisionsPowerSpectrumMultipoles,
                                      FiberCollisionsPowerSpectrumMultipoles,
                                      SystematicTemplatePowerSpectrumMultipoles)


def kaiser():
    return KaiserTracerPowerSpectrumMultipoles(
        ells=(0, 2), k=np.linspace(0.02, 0.2, 30),
        template=ShapeFitPowerSpectrumTemplate(z=1.), mu=6)


def test_tophat_fiber_collisions():
    fc = TopHatFiberCollisionsPowerSpectrumMultipoles(
        k=np.linspace(0.02, 0.2, 25), ells=(0, 2), theory=kaiser(), fs=0.5, Dfc=0.5)
    power = np.asarray(fc.pipeline.evaluate({'b1': 2.0}))
    assert power.shape == (2, 25) and np.all(np.isfinite(power))
    # zero collision scale -> identity (up to grid interpolation)
    fc0 = TopHatFiberCollisionsPowerSpectrumMultipoles(
        k=np.linspace(0.02, 0.2, 25), ells=(0, 2), theory=kaiser(), fs=0.5, Dfc=0.)
    p0 = np.asarray(fc0.pipeline.evaluate({'b1': 2.0}))
    th = np.asarray(fc0.theory.power)
    interp = np.stack([np.interp(fc0.k, fc0.kin, th[i]) for i in range(2)])
    np.testing.assert_allclose(p0, interp, rtol=1e-3)
    # collisions change the power
    assert not np.allclose(power, p0, rtol=1e-4)


def test_general_fiber_collisions_matches_tophat():
    """Sum-of-tophats kernel with a single top-hat ~ TopHat class at small kDfc."""
    k = np.linspace(0.02, 0.1, 15)
    fs, Dfc = 0.4, 0.3
    fc1 = TopHatFiberCollisionsPowerSpectrumMultipoles(k=k, ells=(0,), theory=kaiser(), fs=fs, Dfc=Dfc)
    fc2 = FiberCollisionsPowerSpectrumMultipoles(k=k, ells=(0,), theory=kaiser(),
                                                 sep=np.linspace(0., Dfc, 10), kernel=fs)
    p1 = np.asarray(fc1.pipeline.evaluate({'b1': 2.0}))
    p2 = np.asarray(fc2.pipeline.evaluate({'b1': 2.0}))
    np.testing.assert_allclose(p1, p2, rtol=0.05)


def test_systematic_templates():
    k = np.linspace(0.02, 0.2, 30)
    templates = [np.stack([1e3 * np.ones_like(k), np.zeros_like(k)])]
    st = SystematicTemplatePowerSpectrumMultipoles(templates=templates, theory=kaiser())
    p0 = np.asarray(st.pipeline.evaluate({'b1': 2.0, 'syst_0': 0.}))
    p1 = np.asarray(st.pipeline.evaluate({'b1': 2.0, 'syst_0': 2.}))
    np.testing.assert_allclose(p1[0] - p0[0], 2e3, rtol=1e-4)
    np.testing.assert_allclose(p1[1], p0[1], rtol=1e-5)
