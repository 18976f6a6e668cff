"""Adaptive random-walk Metropolis, vmapped over chains.

In-framework counterpart of the reference's in-repo MCMCSampler
(samplers/mcmc.py:331, CosmoMC-style). Under whole-pipeline jit the
fast/slow parameter blocking that motivates the reference design is
obsolete for traceable graphs (SURVEY.md §2.11); what remains essential is
an adapted Gaussian proposal, implemented here with on-device Robbins-Monro
scale adaptation targeting 23.4% acceptance.

Blocking comes back the moment the graph contains a non-traceable host
code (DESY3Theory-class nodes, ``_host_eval``): ``BlockedMCMCSampler``
runs eagerly, cycles per-block Metropolis updates (slow block once, fast
block oversampled), and Pipeline.run_once's footprint memoization skips
the host call on fast-block moves (reference base.py:737-857 +
mcmc.py:408-424)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .base import BasePosteriorSampler


class MCMCSampler(BasePosteriorSampler):
    """Random-walk Metropolis with chains as a vmapped batch.

    Parameters
    ----------
    nchains : int, default=8
    proposal : (ndim, ndim) covariance or None
        Proposal covariance; defaults to diag(param.proposal^2).
    adapt : bool, default=True
        Adapt the global scale during the first half of the run.
    """

    def __init__(self, likelihood, nchains=8, proposal=None, adapt=True, **kwargs):
        super().__init__(likelihood, **kwargs)
        self.nchains = int(nchains)
        if proposal is None:
            scales = np.array([p.proposal if p.proposal else (p.prior.std if p.prior is not None and np.isfinite(p.prior.std) else 1.)
                               for p in self.varied_params])
            proposal = np.diag(scales ** 2)
        proposal = np.atleast_2d(np.asarray(proposal, dtype='f8'))
        self._chol = np.linalg.cholesky(proposal) * 2.38 / np.sqrt(self.ndim)
        self.adapt = bool(adapt)

    def _build_step(self, nadapt):
        chol = jnp.asarray(self._chol)
        target = 0.234
        logpost = self.logpost_flat

        def step_one(carry, inp):
            x, lp, aux, logscale, istep = carry
            key = inp
            k1, k2 = jax.random.split(key)
            prop = x + jnp.exp(logscale) * chol @ jax.random.normal(k1, (self.ndim,))
            lp_y, aux_y = logpost(prop)
            accept = jnp.log(jax.random.uniform(k2)) < (lp_y - lp)
            x = jnp.where(accept, prop, x)
            lp = jnp.where(accept, lp_y, lp)
            aux = jax.tree.map(lambda new, old: jnp.where(accept, new, old) if new.ndim == 0
                               else jnp.where(accept.reshape((1,) * new.ndim), new, old), aux_y, aux)
            # Robbins-Monro scale adaptation during warmup
            do_adapt = istep < nadapt
            gamma = 1. / jnp.sqrt(1. + istep)
            logscale = jnp.where(do_adapt,
                                 logscale + gamma * (jnp.where(accept, 1., 0.) - target), logscale)
            record = {'x': x, 'logposterior': lp, 'accept': accept, **aux}
            return (x, lp, aux, logscale, istep + 1), record

        return step_one

    def run(self, nsteps=2000, thin=1, burnin=0, nadapt=None, resume=False):
        resume = resume and getattr(self, '_state', None) is not None
        if nadapt is None:
            nadapt = 0 if resume else (nsteps // 2 if self.adapt else 0)
        if resume:
            start, lp0, aux0, logscale0 = self._state
        else:
            start, lp0 = self.get_start(self.nchains)
            _, aux0 = self.logpost_batch(start)
            logscale0 = jnp.zeros(self.nchains)
        step_one = self._build_step(nadapt)

        def run_chain(x0, lp0, aux0, logscale0, key):
            keys = jax.random.split(key, nsteps)
            carry0 = (x0, lp0, aux0, logscale0, jnp.zeros((), dtype=jnp.int32))
            carry, records = lax.scan(step_one, carry0, keys)
            return carry, records

        keys = jax.random.split(self._next_key(), self.nchains)
        start, lp0, aux0, logscale0, keys = self._shard_chains(start, lp0, aux0, logscale0, keys)
        runner = self._cached_jit(('mcmc-run', nsteps, nadapt),
                                  lambda: jax.jit(jax.vmap(run_chain)))
        (x_f, lp_f, aux_f, logscale_f, _), records = runner(
            start, lp0, aux0, logscale0, keys)
        self._state = (x_f, lp_f, aux_f, logscale_f)
        records = jax.tree.map(lambda v: jnp.moveaxis(v, 0, 1), records)  # (nsteps, nchains, ...)
        jax.block_until_ready(records['logposterior'])
        if self.mesh is not None:
            self._mesh_gelman_rubin(records['x'])
        accept = records.pop('accept')
        self.diagnostics['acceptance_rate'] = float(jnp.mean(accept))
        x = records.pop('x')
        sl = slice(burnin, None, thin)
        return self._make_chain(x[sl], {k: v[sl] for k, v in records.items()},
                                attrs={'sampler': 'mcmc', 'acceptance_rate': self.diagnostics['acceptance_rate']})


class BlockedMCMCSampler(BasePosteriorSampler):
    """Eager blocked Metropolis for pipelines containing host-code nodes.

    Parameters are grouped by Pipeline.block_params (footprint-based: the
    slow block touches a ``_host_eval`` calculator, the fast block does
    not) and updated block-by-block with the fast block oversampled;
    run_once's host memoization then skips the host code on fast moves.
    Per-param Robbins-Monro scale adaptation targets 23.4% acceptance.
    """

    def __init__(self, likelihood, nchains=1, oversample_power=0.4, adapt=True, **kwargs):
        super().__init__(likelihood, **kwargs)
        self.nchains = int(nchains)
        self.oversample_power = float(oversample_power)
        self.adapt = bool(adapt)
        self.blocks = self.pipeline.block_params(oversample_power=self.oversample_power)
        names = self.varied_params.names()
        self._block_idx = [(np.array([names.index(n) for n in block]), repeat)
                           for block, repeat in self.blocks]

    @property
    def _logpost_aux(self):
        # host nodes cannot be traced: evaluate the pipeline eagerly
        if self._logpost_aux_fn is None:
            self._logpost_aux_fn = self.likelihood.logpost_fn(jit=False)
        return self._logpost_aux_fn

    def get_start(self, nchains):
        """Eager rejection sampling (the base implementation jits the batch
        posterior, which a host-code pipeline cannot trace)."""
        start = np.empty((nchains, self.ndim))
        logpost = np.full(nchains, -np.inf)
        for ichain in range(nchains):
            for _ in range(self.max_tries):
                draws = np.array([float(np.asarray(p.sample_ref(self._next_key())))
                                  for p in self.varied_params])
                lp, _ = self.logpost_flat(jnp.asarray(draws))
                if np.isfinite(float(lp)):
                    start[ichain], logpost[ichain] = draws, float(lp)
                    break
            else:
                raise ValueError('no finite start point in {} tries'.format(self.max_tries))
        return start, logpost

    def _eager_logpost(self, x):
        lp, aux = self.logpost_flat(jnp.asarray(x))
        return float(lp), aux

    def run(self, nsteps=500, thin=1, burnin=0, resume=False):
        from ..config import host_eval
        rng = np.random.default_rng(
            int(jax.random.randint(self._next_key(), (), 0, 2 ** 31 - 1)))
        names = self.varied_params.names()
        scales = np.array([p.proposal if p.proposal else
                           (p.prior.std if p.prior is not None and np.isfinite(p.prior.std) else 1.)
                           for p in self.varied_params])
        with host_eval():
            if resume and getattr(self, '_state', None) is not None:
                xs, lps, logscale = self._state
            else:
                start, lp0 = self.get_start(self.nchains)
                xs = np.asarray(start, dtype='f8')
                lps = np.asarray(lp0, dtype='f8')
                logscale = np.zeros(len(names))
            records_x = np.empty((nsteps, self.nchains, len(names)))
            records_lp = np.empty((nsteps, self.nchains))
            naccept = nmoves = 0
            for it in range(nsteps):
                for ichain in range(self.nchains):
                    x, lp = xs[ichain].copy(), lps[ichain]
                    for idx, repeat in self._block_idx:
                        for _ in range(repeat):
                            prop = x.copy()
                            prop[idx] = prop[idx] + np.exp(logscale[idx]) * scales[idx] \
                                * rng.standard_normal(idx.size) * 2.38 / np.sqrt(idx.size)
                            lp_y, _ = self._eager_logpost(prop)
                            accept = np.log(rng.uniform()) < (lp_y - lp)
                            if accept:
                                x, lp = prop, lp_y
                            nmoves += 1
                            naccept += int(accept)
                            if self.adapt and it < nsteps // 2:
                                gamma = 1. / np.sqrt(1. + it)
                                logscale[idx] += gamma * ((1. if accept else 0.) - 0.234)
                    xs[ichain], lps[ichain] = x, lp
                records_x[it] = xs
                records_lp[it] = lps
        self._state = (xs, lps, logscale)
        self.diagnostics['acceptance_rate'] = naccept / max(nmoves, 1)
        sl = slice(burnin, None, thin)
        return self._make_chain(records_x[sl], {'logposterior': records_lp[sl]},
                                attrs={'sampler': 'blocked-mcmc',
                                       'blocks': [list(b) for b, _ in self.blocks],
                                       'acceptance_rate': self.diagnostics['acceptance_rate']})
