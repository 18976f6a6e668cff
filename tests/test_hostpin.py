"""Regression pins for host-pinned initialization (VERDICT r3 weak #1).

Under a tunneled/remote TPU default backend, every eager op dispatched at
initialization is a ~10 ms round trip — and a backend outage kills pipeline
*construction* before any TPU work is needed (the round-3 bench failure).
All init-time work must therefore run under ``config.host_eval()``, i.e.
pinned to the first CPU device regardless of the ambient default device.

The 8-virtual-CPU-device test mesh lets us simulate the remote default:
set the ambient default device to cpu:3 (standing in for the TPU) and
assert that arrays created inside ``initialize`` land on cpu:0 (the
host_eval pin) instead.
"""

import numpy as np
import jax
import jax.numpy as jnp

from desilike_tpu.core.calculator import Calculator


class _ProbeCalculator(Calculator):
    """Creates an eager jnp array during initialize; records its device."""

    def initialize(self):
        self._init_array = jnp.zeros(3)

    def calculate(self):
        self.out = jnp.asarray(1.0)

    def get(self):
        return self.out


def test_initialize_runs_on_host_cpu0():
    devices = jax.devices()
    assert len(devices) >= 4
    probe = _ProbeCalculator()
    with jax.default_device(devices[3]):  # simulate a remote default backend
        probe.pipeline  # build triggers RuntimeInfo.initialize
    host = jax.devices('cpu')[0]
    assert probe._init_array.devices() == {host}


def test_pipeline_evaluate_runs_on_host_cpu0():
    devices = jax.devices()
    probe = _ProbeCalculator()
    with jax.default_device(devices[3]):
        probe.pipeline.evaluate({})
    host = jax.devices('cpu')[0]
    assert probe.out.devices() == {host}


def test_background_resolve_is_device_free():
    """bg.resolve on plain floats must not create any jax array (the r3
    bench died on exactly this eager dispatch, background.py:42)."""
    from desilike_tpu.cosmology import background as bg
    full = bg.resolve({'logA': 3.0})
    assert not isinstance(full['A_s'], jax.Array)
    np.testing.assert_allclose(full['A_s'], np.exp(3.0) * 1e-10, rtol=1e-12)
    # ... and stays traced/differentiable when handed a jax value
    g = jax.grad(lambda la: bg.resolve({'logA': la})['A_s'] * 1e10)(3.0)
    np.testing.assert_allclose(float(g), np.exp(3.0), rtol=1e-6)


def test_bench_build_phase_completes_on_cpu():
    """Ratchet (VERDICT r3 next #10): the bench's build phase is pure host
    work. With the ambient default device standing in for the remote TPU
    and device-to-device transfers disallowed, the full flagship build must
    run to completion — any init-time op dispatched to the ambient device
    (the round-3 bench killer) would either land state off cpu:0 or force
    a cross-device transfer when host-pinned work consumes it; both raise
    here."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    devices = jax.devices()
    with jax.default_device(devices[5]), \
            jax.transfer_guard_device_to_device('disallow'):
        fn, values, batch = bench.build()
    assert batch == 32768  # the round-5 chip-optimum default (bench.py:65)
    assert values and all(isinstance(v, np.ndarray) for v in values.values())
