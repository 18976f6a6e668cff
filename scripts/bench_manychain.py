#!/usr/bin/env python
"""Many-chain gradient-sampler throughput on the flagship BAO posterior.

Measures retained-sample and gradient-eval throughput at 4096 chains for
the tree-based NUTS, the jittered fixed-budget NUTS (trajectory='jitter'),
and ChEES — the lockstep-tax comparison (README many-chain row). Run ALONE
on the TPU (serialize with other runs; first compile is minutes):

    python scripts/bench_manychain.py [nchains] [nsteps]
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np


def main():
    nchains = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    only = sys.argv[3] if len(sys.argv) > 3 else None
    nwarmup = int(sys.argv[4]) if len(sys.argv) > 4 else 300
    from __graft_entry__ import _build_likelihood
    from desilike_tpu.samplers import NUTSSampler, ChEESSampler

    like = _build_likelihood(small=True)
    out = {}
    samplers = (
        ('nuts-tree', lambda: NUTSSampler(like, seed=5, nchains=nchains, trajectory='nuts')),
        ('nuts-jitter', lambda: NUTSSampler(like, seed=5, nchains=nchains, trajectory='jitter')),
        ('chees', lambda: ChEESSampler(like, seed=5, nchains=nchains)))
    for name, factory in samplers:
        if only and name != only:
            continue
        sampler = factory()
        # every run() call re-traces (remote compile is minutes), so measure
        # the MARGINAL step cost: wall(nsteps) - wall(nsteps_small) cancels
        # the compile time, which is ~independent of the scan length
        nsteps_small = max(5, nsteps // 10)

        def timed(n, first=False):
            t0 = time.time()
            kw = dict(nwarmup=nwarmup) if first else dict(nwarmup=0, resume=True)
            if name.startswith('nuts') and not first:
                kw = dict(resume=True)
            chain = sampler.run(nsteps=n, **kw)
            return time.time() - t0, chain

        timed(nsteps_small, first=True)  # adapt + compile path
        dt_small, _ = timed(nsteps_small)
        dt_big, chain = timed(nsteps)
        dt = dt_big - dt_small
        nsteps_eff = nsteps - nsteps_small
        gr = np.asarray(chain.remove_burnin(0.2).gelman_rubin(chain.names()[:2]))
        # gradient evals: tree ~ mean path length per step; jitter/chees ~ mean leapfrogs
        if name == 'nuts-tree':
            grads_per_step = 2. ** 5  # depth telemetry not retained; report samples/s as primary
        else:
            grads_per_step = sampler.diagnostics.get('jitter_path_length',
                                                     sampler.diagnostics.get('mean_leapfrog', 0.))
        out[name] = {'samples_per_sec': nchains * nsteps_eff / dt, 'wall_s': dt,
                     'gelman_rubin': gr.tolist(), 'leapfrogs_per_step': float(grads_per_step)}
        print(name, json.dumps(out[name]))
    print(json.dumps({'bench': 'manychain', 'nchains': nchains, **out}))


if __name__ == '__main__':
    main()
