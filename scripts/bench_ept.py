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
    like = build()
    pipe = like.pipeline
    fn = like.logpost_fn()
    batch = 2048
    rng = np.random.default_rng(0)
    values = {}
    for p in pipe.varied_params:
        scale = p.proposal or 0.01
        values[p.name] = jnp.asarray(p.value + scale * 0.1 * rng.standard_normal(batch),
                                     dtype=jnp.float32)
    vfn = jax.jit(jax.vmap(lambda v: fn(v)[0]))
    out = vfn(values)
    jax.block_until_ready(out)
    nrep = 10
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = vfn(values)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    evals = nrep * batch / dt
    print(json.dumps({'metric': 'ept_1loop_likelihood_evals_per_sec',
                      'value': round(evals, 1), 'unit': 'evals/s',
                      'vs_baseline': round(evals / 1e5, 4)}))


if __name__ == '__main__':
    main()
