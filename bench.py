"""Benchmark: BAO+FS likelihood evaluations/sec on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
vs_baseline is relative to the BASELINE.json north-star target of 1e5
full likelihood evaluations/sec on a single chip.
"""

import json
import sys
import time

sys.path.insert(0, '.')

import numpy as np
import jax
import jax.numpy as jnp


def build_likelihood():
    from desilike_tpu.theories import (DampedBAOWigglesTracerPowerSpectrumMultipoles,
                                       BAOPowerSpectrumTemplate)
    from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable, BoxFootprint
    from desilike_tpu.likelihoods import ObservablesGaussianLikelihood

    template = BAOPowerSpectrumTemplate(z=0.8, apmode='qparqper')
    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=(0, 2), template=template)
    theory.init.params = {'al*': dict(derived='.marg')}
    obs = TracerPowerSpectrumMultipolesObservable(
        data={'qpar': 1.0, 'qper': 1.0, 'b1': 2.0},
        klim={0: (0.02, 0.3, 0.005), 2: (0.02, 0.3, 0.005)}, theory=theory)
    footprint = BoxFootprint(volume=2e9, nbar=5e-4)
    return ObservablesGaussianLikelihood(observables=[obs], footprints=[footprint])


def main():
    like = build_likelihood()
    pipe = like.pipeline
    fn = like.logpost_fn()
    names = pipe.varied_params.names()

    batch = 4096
    rng = np.random.default_rng(0)
    values = {}
    for p in pipe.varied_params:
        scale = p.proposal or 0.01
        values[p.name] = jnp.asarray(p.value + scale * 0.1 * rng.standard_normal(batch),
                                     dtype=jnp.float32)

    vfn = jax.jit(jax.vmap(lambda v: fn(v)[0]))
    # warmup/compile
    out = vfn(values)
    jax.block_until_ready(out)

    nrep = 20
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = vfn(values)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    evals_per_sec = nrep * batch / dt

    target = 1e5
    print(json.dumps({
        'metric': 'bao_likelihood_evals_per_sec',
        'value': round(evals_per_sec, 1),
        'unit': 'evals/s',
        'vs_baseline': round(evals_per_sec / target, 4),
    }))


if __name__ == '__main__':
    main()
