"""Multi-chip scaling of mesh-sharded many-chain sampling (virtual devices).

Runs the ChEES sampler on the 2-parameter Gaussian fixture with chains
sharded over an n-device mesh vs a single device, and reports wall-clock,
chain throughput, and bit-equality of the draws (the layout-independence
contract: fold_keys assigns per-chain randomness by chain index, so the
same chains land on any mesh shape, SURVEY.md 2.11).

On this driver image the devices are virtual CPU shards
(xla_force_host_platform_device_count), so the printed scaling measures
partitioning overhead, not real ICI speedup; on a real pod slice the same
code path shards over chips.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 python scripts/bench_multichip.py
"""

import json
import os
import sys
import time

sys.path.insert(0, '.')
sys.path.insert(0, '..')

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')

import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np


def build_likelihood():
    import jax.numpy as jnp
    from desilike_tpu.likelihoods import BaseGaussianLikelihood

    class GaussianModel(BaseGaussianLikelihood):
        _params = dict(BaseGaussianLikelihood._params)
        _params.update({
            'a': dict(value=1.0, prior=dict(limits=[-4, 4]), ref=dict(dist='norm', loc=1.0, scale=0.2)),
            'b': dict(value=-0.5, prior=dict(limits=[-4, 4]), ref=dict(dist='norm', loc=-0.5, scale=0.2)),
        })

        def initialize(self, **kwargs):
            self.x = np.linspace(-1, 1, 50)
            data = 1.0 * self.x - 0.5
            super().initialize(data=data, covariance=np.eye(50) * 0.04)

        def flattheory(self):
            return self._a * jnp.asarray(self.x) + self._b

        def calculate(self, a=1., b=0., **kw):
            self._a, self._b = a, b
            super().calculate()

    return GaussianModel()


def run(mesh, nchains=256, nsteps=200):
    from desilike_tpu.samplers import ChEESSampler
    like = build_likelihood()
    sampler = ChEESSampler(like, nchains=nchains, seed=7, mesh=mesh)
    t0 = time.perf_counter()
    chain = sampler.run(nsteps=nsteps, nwarmup=100)
    dt = time.perf_counter() - t0
    return chain, dt


def main():
    from desilike_tpu.parallel.mesh import make_mesh
    ndev = len(jax.devices())
    nchains, nsteps = 256, 200
    chain1, dt1 = run(None, nchains=nchains, nsteps=nsteps)
    chainN, dtN = run(make_mesh(ndev), nchains=nchains, nsteps=nsteps)
    a1 = np.asarray(chain1['a'])
    aN = np.asarray(chainN['a'])
    bit_identical = bool(np.array_equal(a1, aN))
    print(json.dumps({
        'metric': 'chees_sharded_chain_steps_per_sec',
        'value': round(nchains * nsteps / dtN, 1),
        'unit': 'chain-steps/s',
        'vs_baseline': round(dt1 / dtN, 4),
        'n_devices': ndev,
        'bit_identical_to_unsharded': bit_identical,
    }))
    if not bit_identical:
        raise SystemExit('sharded chains differ from unsharded - layout contract broken')


if __name__ == '__main__':
    main()
