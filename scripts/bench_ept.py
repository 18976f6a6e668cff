"""On-chip throughput of the 1-loop EPT likelihood (config-3 class).

Not the driver benchmark (bench.py is the flagship joint FS+BAO config);
run manually on the TPU to track the EPT loop-path optimizations
(README performance table).
"""

import json
import sys
import time

sys.path.insert(0, '.')
sys.path.insert(0, '..')

import numpy as np
import jax
import jax.numpy as jnp


def build():
    from desilike_tpu.theories import EPTTracerPowerSpectrumMultipoles, ShapeFitPowerSpectrumTemplate
    from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable, BoxFootprint
    from desilike_tpu.likelihoods import ObservablesGaussianLikelihood
    theory = EPTTracerPowerSpectrumMultipoles(
        ells=(0, 2, 4), template=ShapeFitPowerSpectrumTemplate(z=0.8))
    theory.init.params = {'ct*': dict(derived='.marg'), 'sn*': dict(derived='.marg')}
    obs = TracerPowerSpectrumMultipolesObservable(
        data={'b1': 2.0}, klim={0: (0.02, 0.2, 0.005), 2: (0.02, 0.2, 0.005), 4: (0.02, 0.2, 0.005)},
        theory=theory)
    return ObservablesGaussianLikelihood(observables=[obs],
                                         footprints=[BoxFootprint(volume=2e9, nbar=5e-4)])


def main():
    # measurement methodology shared with the driver bench (bench.measure):
    # lax.scan repetition INSIDE the compiled program with iteration-
    # dependent input perturbations — a host-side loop re-dispatching
    # identical arguments measured an unphysical 122M evals/s through the
    # remote-TPU runtime (BENCH_r04; see bench.py and CLAUDE.md)
    import os
    from desilike_tpu.config import host_eval
    from bench import measure
    with host_eval():
        like = build()
        pipe = like.pipeline
        fn = like.logpost_fn()
        # batch sweep on-chip (round 5, scan methodology): 216k @ 8192,
        # 239k @ 16384, 496k @ 32768 evals/s, OOM @ 65536 (the 1-loop
        # intermediate would need 24 GB HBM) — small batches are bound by
        # per-iteration kernel overheads, 32768 is compute-bound and the
        # single-chip optimum
        batch = int(os.environ.get('DESILIKE_TPU_BENCH_BATCH', 32768))
        rng = np.random.default_rng(0)
        values = {}
        for p in pipe.varied_params:
            scale = p.proposal or 0.01
            values[p.name] = np.asarray(
                p.value + scale * 0.1 * rng.standard_normal(batch), dtype='f4')
    evals = measure(fn, values, batch)
    print(json.dumps({'metric': 'ept_1loop_likelihood_evals_per_sec',
                      'value': round(evals, 1), 'unit': 'evals/s',
                      'vs_baseline': round(evals / 1e5, 4)}))


if __name__ == '__main__':
    main()
