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
    """Flagship config (BASELINE.json config 4): window-convolved joint
    FS+BAO, 2 tracers, analytic marginalization over all linear nuisances."""
    from desilike_tpu.theories import (DampedBAOWigglesTracerPowerSpectrumMultipoles,
                                       BAOPowerSpectrumTemplate, ShapeFitPowerSpectrumTemplate)
    from desilike_tpu.theories.full_shape import EFTLikeKaiserTracerPowerSpectrumMultipoles
    from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable, BoxFootprint
    from desilike_tpu.likelihoods import ObservablesGaussianLikelihood

    observables, footprints = [], []
    for tracer, z, b1 in [('LRG', 0.8, 2.0), ('ELG', 1.1, 1.3)]:
        fs_theory = EFTLikeKaiserTracerPowerSpectrumMultipoles(
            ells=(0, 2), template=ShapeFitPowerSpectrumTemplate(z=z, namespace=tracer),
            namespace=tracer)
        fs_theory.init.params = {'ct*': dict(derived='.marg'), 'sn*': dict(derived='.marg')}
        observables.append(TracerPowerSpectrumMultipolesObservable(
            data={'{}.b1'.format(tracer): b1},
            klim={0: (0.02, 0.2, 0.005), 2: (0.02, 0.2, 0.005)}, theory=fs_theory))
        footprints.append(BoxFootprint(volume=2e9, nbar=5e-4))
        bao_theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(
            ells=(0, 2), template=BAOPowerSpectrumTemplate(z=z, namespace=tracer + 'bao'),
            namespace=tracer + 'bao')
        bao_theory.init.params = {'al*': dict(derived='.marg')}
        observables.append(TracerPowerSpectrumMultipolesObservable(
            data={'{}bao.b1'.format(tracer): b1},
            klim={0: (0.02, 0.3, 0.005), 2: (0.02, 0.3, 0.005)}, theory=bao_theory))
        footprints.append(BoxFootprint(volume=2e9, nbar=5e-4))
    return ObservablesGaussianLikelihood(observables=observables, footprints=footprints)


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
        'metric': 'joint_2tracer_fs_bao_likelihood_evals_per_sec',
        'value': round(evals_per_sec, 1),
        'unit': 'evals/s',
        'vs_baseline': round(evals_per_sec / target, 4),
    }))


if __name__ == '__main__':
    main()
