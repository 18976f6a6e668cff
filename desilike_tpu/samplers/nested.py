"""JAX-native nested sampler: evidence + posterior on-device.

In-framework replacement for the reference's external nested-sampler bindings
(samplers/dynesty.py:175, polychord.py:13, nautilus.py, pocomc.py) — instead
of binding a host library, the whole constrained-sampling kernel is one jitted
program, TPU-first:

- live points live in the unit cube; the prior transform (``Prior.ppf_jax``)
  runs on device inside the kernel;
- each iteration deletes the ``nbatch`` worst points at once and regenerates
  all of them in parallel with vmapped random-direction slice sampling
  (Neal 2003 shrinkage from an interval covering the cube) — the batch axis
  is the TPU parallelism axis, shardable over a device mesh like the chain
  axis of the MCMC samplers;
- shrinkage bookkeeping, evidence accumulation and the dlogz stopping rule
  follow the standard (Skilling 2006) estimates, computed host-side between
  jitted batch steps.

The reference surfaces results as a weighted Chain with ``logweight`` and
``aweight`` columns (dynesty.py:140-150); this sampler does the same, with
``logz``/``logzerr`` in ``chain.attrs``.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .base import BasePosteriorSampler


class NestedSampler(BasePosteriorSampler):
    """Static nested sampling with batched live-point replacement.

    Parameters
    ----------
    likelihood : BaseLikelihood
    nlive : int, default=512
        Number of live points.
    nbatch : int, default=nlive//4
        Number of worst points deleted (and regenerated in parallel) per
        iteration. Larger batches increase device utilization at slightly
        coarser shrinkage granularity.
    num_slices : int, default=max(5, 2*ndim)
        Random-direction slice updates per replacement (decorrelation length).

    All varied parameters must have proper priors (finite-volume support);
    the evidence is defined w.r.t. these priors.
    """

    def __init__(self, likelihood, nlive=512, nbatch=None, num_slices=None, **kwargs):
        super().__init__(likelihood, **kwargs)
        self.nlive = int(nlive)
        self.nbatch = int(nbatch) if nbatch is not None else max(1, self.nlive // 4)
        if self.nbatch >= self.nlive:
            raise ValueError('nbatch must be < nlive')
        self.num_slices = int(num_slices) if num_slices is not None else max(5, 2 * self.ndim)
        self.priors = [p.prior for p in self.varied_params]
        for p, prior in zip(self.varied_params, self.priors):
            if not (prior.is_proper and np.isfinite([prior.ppf(1e-6), prior.ppf(1. - 1e-6)]).all()):
                raise ValueError('nested sampling requires proper priors; {} has {}'.format(p.name, prior))

    # --- kernel pieces ---

    def _transform(self, u):
        """Unit cube -> parameter space, jit-safe."""
        return jnp.stack([prior.ppf_jax(u[i]) for i, prior in enumerate(self.priors)])

    def _nsloglike(self, u):
        """Nested-sampling likelihood: logposterior minus the varied-parameter
        log prior (the prior is the sampling measure via the transform)."""
        theta = self._transform(jnp.clip(u, 0., 1.))
        lp, _ = self.logpost_flat(theta)
        logprior = sum(prior.logpdf(theta[i]) for i, prior in enumerate(self.priors))
        L = lp - logprior
        return jnp.where(jnp.isfinite(L), L, -jnp.inf)

    def _build_batch_step(self):
        ndim, nlive, K, S = self.ndim, self.nlive, self.nbatch, self.num_slices
        nsloglike = self._nsloglike
        width = float(np.sqrt(ndim))  # covers the cube along any direction

        def one_slice(carry, key):
            """One random-direction slice update from the current point
            (shrinkage procedure: initial bracket is a superset of the cube,
            shrink toward the origin point on rejection)."""
            u0, L0, Lmin, ncall = carry
            kd, kw = jax.random.split(key)
            d = jax.random.normal(kd, (ndim,))
            d = d / jnp.linalg.norm(d)

            def cond(st):
                return (~st[4]) & (st[5] < 32)

            def body(st):
                left, right, u_cur, L_cur, done, it, ncall, key = st
                key, kt = jax.random.split(key)
                t = jax.random.uniform(kt, minval=left, maxval=right)
                u_new = u0 + t * d
                inside = jnp.all((u_new >= 0.) & (u_new <= 1.))
                L_new = jnp.where(inside, nsloglike(u_new), -jnp.inf)
                accept = L_new > Lmin
                left = jnp.where(accept | (t >= 0.), left, t)
                right = jnp.where(accept | (t < 0.), right, t)
                u_cur = jnp.where(accept, u_new, u_cur)
                L_cur = jnp.where(accept, L_new, L_cur)
                return (left, right, u_cur, L_cur, done | accept, it + 1, ncall + 1, key)

            st = (-width, width, u0, L0, jnp.asarray(False), jnp.asarray(0), ncall, kw)
            st = lax.while_loop(cond, body, st)
            return (st[2], st[3], Lmin, st[6]), None

        def replace_one(key, u_start, L_start, Lmin):
            keys = jax.random.split(key, S)
            (u, L, _, ncall), _ = lax.scan(one_slice, (u_start, L_start, Lmin, jnp.asarray(0)), keys)
            return u, L, ncall

        def batch_step(state, key):
            u_live, L_live = state
            order = jnp.argsort(L_live)
            dead_idx, surv_idx = order[:K], order[K:]
            Lmin = L_live[order[K - 1]]
            kpick, krep = jax.random.split(key)
            pick = jax.random.randint(kpick, (K,), 0, nlive - K)
            starts = surv_idx[pick]
            keys = jax.random.split(krep, K)
            new_u, new_L, ncalls = jax.vmap(replace_one)(keys, u_live[starts], L_live[starts], jnp.full((K,), Lmin))
            u_dead, L_dead = u_live[dead_idx], L_live[dead_idx]  # ascending in L
            u_live = u_live.at[dead_idx].set(new_u)
            L_live = L_live.at[dead_idx].set(new_L)
            return (u_live, L_live), (u_dead, L_dead, jnp.sum(ncalls))

        return jax.jit(batch_step)

    # --- run ---

    def run(self, dlogz=0.1, max_iterations=100000, **kwargs):
        """Run to the dlogz evidence criterion; returns a weighted Chain
        (columns ``logweight``/``aweight``; ``chain.attrs['logz'/'logzerr']``)."""
        nlive, K = self.nlive, self.nbatch
        ku = self._next_key()
        u_live = jax.random.uniform(ku, (nlive, self.ndim))
        L_live = jax.jit(jax.vmap(self._nsloglike))(u_live)
        u_live, L_live = self._shard_chains(u_live, L_live)
        step = self._build_batch_step()

        # host-side bookkeeping (Skilling 2006 expected shrinkage)
        dead_u, dead_L, dead_logw = [], [], []
        logX = 0.0
        logz = -np.inf
        H = 0.0
        ncall = int(nlive)
        shrink = np.cumsum(1.0 / (nlive - np.arange(K)))  # per-batch log-volume decrements
        it = 0
        while it * K < max_iterations:
            (u_live, L_live), (u_d, L_d, nc) = step((u_live, L_live), self._next_key())
            L_d = np.asarray(L_d)
            ncall += int(nc)
            logX_j = logX - shrink                      # log X after each deletion
            logX_prev = np.concatenate([[logX], logX_j[:-1]])
            # log(dX_j) = log(X_{j-1} - X_j), stable via log1p
            logdX = logX_prev + np.log1p(-np.exp(logX_j - logX_prev))
            logw = np.where(np.isfinite(L_d), L_d + logdX, -np.inf)
            logz_new = np.logaddexp(logz, np.logaddexp.reduce(logw))
            if np.isfinite(logz_new):
                # incremental information update (Skilling 2006 eq. 22):
                # H_new = sum_j w_j L_j / Z_new + (Z_old/Z_new)(H_old + logZ_old) - logZ_new
                new_term = float(np.sum(np.exp(logw - logz_new) * np.where(np.isfinite(L_d), L_d, 0.)))
                old_term = float(np.exp(logz - logz_new) * (H + logz)) if np.isfinite(logz) else 0.
                H = new_term + old_term - logz_new
            logz = logz_new
            dead_u.append(np.asarray(u_d)); dead_L.append(L_d); dead_logw.append(logw)
            logX = logX - float(shrink[-1])
            it += 1
            Lmax = float(np.max(np.asarray(L_live)))
            logz_remain = Lmax + logX
            if np.logaddexp(logz, logz_remain) - logz < dlogz:
                break
        # final live set: each live point carries X/nlive of the remaining volume
        u_l = np.asarray(u_live); L_l = np.asarray(L_live)
        order = np.argsort(L_l)
        u_l, L_l = u_l[order], L_l[order]
        logw_l = np.where(np.isfinite(L_l), L_l + logX - np.log(nlive), -np.inf)
        logz = np.logaddexp(logz, np.logaddexp.reduce(logw_l))

        u_all = np.concatenate(dead_u + [u_l])
        L_all = np.concatenate(dead_L + [L_l])
        logw_all = np.concatenate(dead_logw + [logw_l])
        logzerr = float(np.sqrt(max(H, 0.) / nlive)) if np.isfinite(H) else float('nan')
        self.diagnostics.update({'logz': float(logz), 'logzerr': logzerr,
                                 'ncall': ncall, 'niterations': it})
        return self._make_nested_chain(u_all, L_all, logw_all, float(logz), logzerr, ncall, it)

    def _make_nested_chain(self, u_all, L_all, logw_all, logz, logzerr, ncall, it):
        from ..samples.chain import Chain
        thetas = jax.jit(jax.vmap(lambda u: self._transform(jnp.clip(u, 0., 1.))))(jnp.asarray(u_all))
        lp, aux = jax.jit(jax.vmap(self.logpost_flat))(thetas)
        chain = Chain()
        thetas = np.asarray(thetas)
        for i, p in enumerate(self.varied_params):
            chain[p] = thetas[:, i]
        chain['logposterior'] = np.asarray(lp)
        for name, val in aux.items():
            if name == 'solved_hessian':
                chain.attrs['solved_hessian'] = np.asarray(val)
                continue
            param = self.pipeline.params.get(name)
            chain[param if param is not None else name] = np.asarray(val)
        chain['logweight'] = logw_all
        with np.errstate(invalid='ignore'):
            chain['aweight'] = np.exp(logw_all - np.max(logw_all[np.isfinite(logw_all)]))
        chain['aweight'] = np.where(np.isfinite(chain['aweight']), chain['aweight'], 0.)
        solved_names = self.pipeline.solved_params.names()
        if solved_names:
            chain.attrs['solved_names'] = solved_names
        chain.attrs.update({'sampler': 'nested', 'logz': logz, 'logzerr': logzerr,
                            'ncall': ncall, 'niterations': it, 'nlive': self.nlive})
        if self.save_fn:
            chain.save(self.save_fn)
        return chain

    def sample(self, dlogz=0.1, max_iterations=100000, **kwargs):
        """Nested sampling has its own stopping rule; sample() == run()."""
        return self.run(dlogz=dlogz, max_iterations=max_iterations)
