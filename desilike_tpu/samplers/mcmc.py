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
    """Random-walk Metropolis with chains as a vmapped batch and a LEARNED
    full-covariance proposal (Haario-style adaptive Metropolis, the role the
    reference's BlockProposer + learned covariance play, ref mcmc.py:199,331).

    The proposal covariance is estimated by a pooled streaming (Welford)
    covariance over ALL chains during the adaptation phase — with a vmapped
    chain batch the cross-chain pool converges ~nchains times faster than
    any single chain's history — alongside a Robbins-Monro global scale
    targeting the 23.4% optimum. The per-step Cholesky refresh runs at
    batch level (never under vmap: batched LAPACK custom calls are a known
    TPU cliff) and disappears entirely from the frozen sampling phase.

    Parameters
    ----------
    nchains : int, default=8
    proposal : (ndim, ndim) covariance or None
        Initial proposal covariance; defaults to diag(param.proposal^2).
    adapt : bool or str, default=True
        True/'cov': learn scale + full covariance; 'scale': legacy global
        scale only; False: fixed proposal.
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
        if adapt is True:
            adapt = 'cov'
        self.adapt = adapt if adapt in ('cov', 'scale') else False

    def _metropolis(self, x, lp, aux, logscale, L, key):
        ndim, nchains = self.ndim, self.nchains
        k1, k2 = jax.random.split(key)
        z = jax.random.normal(k1, (nchains, ndim), dtype=x.dtype)
        prop = x + jnp.exp(logscale) * z @ L.T
        lp_y, aux_y = jax.vmap(self.logpost_flat)(prop)
        accept = jnp.log(jax.random.uniform(k2, (nchains,))) < (lp_y - lp)
        x = jnp.where(accept[:, None], prop, x)
        lp = jnp.where(accept, lp_y, lp)
        aux = jax.tree.map(
            lambda new, old: jnp.where(accept.reshape((nchains,) + (1,) * (new.ndim - 1)), new, old),
            aux_y, aux)
        return x, lp, aux, accept

    def _build_phases(self, nadapt, nfrozen):
        ndim, nchains = self.ndim, self.nchains
        target = 0.234
        learn_cov = self.adapt == 'cov'
        min_count = max(8 * ndim, 2 * nchains)

        collect_from = nadapt // 3  # early states are ref-distribution sticky

        def adapt_body(carry, key):
            x, lp, aux, logscale, L, wmean, wm2, count, istep = carry
            x, lp, aux, accept = self._metropolis(x, lp, aux, logscale, L, key)
            gamma = 1. / jnp.sqrt(1. + istep)
            logscale = logscale + gamma * (jnp.mean(accept) - target)
            # pooled Welford chunk update with the whole batch of states
            # (skipping the pre-collect_from transient)
            collect = istep >= collect_from
            mean_b = jnp.mean(x, axis=0)
            d_b = x - mean_b
            m2_b = d_b.T @ d_b
            delta = mean_b - wmean
            count_new = count + jnp.where(collect, float(nchains), 0.)
            safe = jnp.maximum(count_new, 1.)
            wmean = wmean + jnp.where(collect, delta * (nchains / safe), 0.)
            wm2 = wm2 + jnp.where(collect, m2_b + jnp.outer(delta, delta) * (count * nchains / safe), 0.)
            if learn_cov:
                cov = wm2 / jnp.maximum(count_new - 1., 1.)
                # Haario regularization keeps early estimates factorizable
                cov = cov + 1e-8 * jnp.trace(cov) / ndim * jnp.eye(ndim, dtype=cov.dtype)
                Lnew = jnp.linalg.cholesky(cov) * (2.38 / np.sqrt(ndim))
                ok = (count_new > min_count) & jnp.all(jnp.isfinite(Lnew))
                L = jnp.where(ok, Lnew, L)
            record = {'x': x, 'logposterior': lp, 'accept': accept, **aux}
            return (x, lp, aux, logscale, L, wmean, wm2, count_new, istep + 1.), record

        def frozen_body(carry, key):
            x, lp, aux, logscale, L = carry
            x, lp, aux, accept = self._metropolis(x, lp, aux, logscale, L, key)
            record = {'x': x, 'logposterior': lp, 'accept': accept, **aux}
            return (x, lp, aux, logscale, L), record

        def run_all(x0, lp0, aux0, logscale0, L0, keys):
            wmean0 = jnp.zeros(ndim, dtype=x0.dtype)
            wm20 = jnp.zeros((ndim, ndim), dtype=x0.dtype)
            carryA = (x0, lp0, aux0, logscale0, L0, wmean0, wm20,
                      jnp.zeros(()), jnp.zeros(()))
            recsA = None
            if nadapt > 0:
                carryA, recsA = lax.scan(adapt_body, carryA, keys[:nadapt])
            x, lp, aux, logscale, L = carryA[:5]
            carryB = (x, lp, aux, logscale, L)
            recsB = None
            if nfrozen > 0:
                carryB, recsB = lax.scan(frozen_body, carryB, keys[nadapt:])
            if recsA is None:
                records = recsB
            elif recsB is None:
                records = recsA
            else:
                records = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), recsA, recsB)
            return carryB, records

        return run_all

    def run(self, nsteps=2000, thin=1, burnin=0, nadapt=None, resume=False):
        resume = resume and getattr(self, '_state', None) is not None
        if nadapt is None:
            nadapt = 0 if resume else (nsteps // 2 if self.adapt else 0)
        nadapt = min(int(nadapt), nsteps)
        if resume:
            start, lp0, aux0, logscale0, L0 = self._state
        else:
            start, lp0 = self.get_start(self.nchains)
            start = jnp.asarray(start)
            _, aux0 = self.logpost_batch(start)
            logscale0 = jnp.zeros(())
            L0 = jnp.asarray(self._chol, dtype=start.dtype)
        run_all = self._build_phases(nadapt, nsteps - nadapt)
        keys = jax.random.split(self._next_key(), nsteps)
        start, lp0, aux0 = self._shard_chains(start, lp0, aux0)
        runner = self._cached_jit(('mcmc-run', nsteps, nadapt, str(self.adapt)),
                                  lambda: jax.jit(run_all))
        (x_f, lp_f, aux_f, logscale_f, L_f), records = runner(
            start, lp0, aux0, logscale0, L0, keys)
        self._state = (x_f, lp_f, aux_f, logscale_f, L_f)
        jax.block_until_ready(records['logposterior'])
        if self.mesh is not None:
            self._mesh_gelman_rubin(records['x'])
        accept = records.pop('accept')
        self.diagnostics['acceptance_rate'] = float(jnp.mean(accept))
        self.diagnostics['proposal_scale'] = float(jnp.exp(logscale_f))
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
    Per-block Robbins-Monro scale adaptation targets 23.4% acceptance, and
    a per-block sample covariance learned from the chains' own history
    replaces the diagonal proposal once enough states accumulate (the
    reference's learned BlockProposer, ref mcmc.py:199).

    With ``drag=n > 0`` (and a slow + fast split present), slow-block moves
    use Neal (2004) fast-parameter dragging, the reference's optional
    dragging scheme (ref mcmc.py:408-424): the fast parameters take ``n``
    Metropolis steps against the density interpolated between the slow
    start/end points while the whole trajectory is accepted as ONE move;
    the host code still runs only once per slow proposal (both slow
    endpoints stay in run_once's LRU memo across the fast updates).
    """

    def __init__(self, likelihood, nchains=1, oversample_power=0.4, adapt=True,
                 drag=0, **kwargs):
        super().__init__(likelihood, **kwargs)
        self.nchains = int(nchains)
        self.oversample_power = float(oversample_power)
        self.adapt = bool(adapt)
        self.drag = int(drag)
        self.blocks = self.pipeline.block_params(oversample_power=self.oversample_power)
        names = self.varied_params.names()
        self._block_idx = [(np.array([names.index(n) for n in block]), repeat)
                           for block, repeat in self.blocks]
        if self.drag and len(self._block_idx) != 2:
            raise ValueError('dragging needs exactly one slow + one fast block '
                             '(got {} blocks)'.format(len(self._block_idx)))

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

    def _block_step(self, iblock, x, lp, rng, logscale, chols, adapting, it):
        """One Metropolis update of block ``iblock``; returns (x, lp, accept)."""
        idx, _ = self._block_idx[iblock]
        prop = x.copy()
        prop[idx] = prop[idx] + np.exp(logscale[iblock]) * (
            chols[iblock] @ rng.standard_normal(idx.size)) * 2.38 / np.sqrt(idx.size)
        lp_y, _ = self._eager_logpost(prop)
        accept = np.log(rng.uniform()) < (lp_y - lp)
        if accept:
            x, lp = prop, lp_y
        if adapting:
            gamma = 1. / np.sqrt(1. + it)
            logscale[iblock] += gamma * ((1. if accept else 0.) - 0.234)
        return x, lp, accept

    def _drag_step(self, x, lp, rng, logscale, chols, adapting, it):
        """Neal (2004) dragged slow-block move (reference mcmc.py:408-424):
        propose the slow block, take ``self.drag`` fast Metropolis steps
        against the interpolated density, accept the whole trajectory with
        log A = (1/n) sum_i [logP(y_slow, f_i) - logP(x_slow, f_i)]."""
        (idx_s, _), (idx_f, _) = self._block_idx
        n = self.drag
        y = x.copy()
        y[idx_s] = y[idx_s] + np.exp(logscale[0]) * (
            chols[0] @ rng.standard_normal(idx_s.size)) * 2.38 / np.sqrt(idx_s.size)
        lp0_f = lp                      # logP(x_slow, f_0)
        xs_end = x.copy()
        xs_end[idx_s] = y[idx_s]
        lp1_f, _ = self._eager_logpost(xs_end)  # logP(y_slow, f_0): ONE new host call
        f = x[idx_f].copy()
        drag_sum = 0.
        for i in range(1, n + 1):
            drag_sum += lp1_f - lp0_f   # at f_{i-1}
            lam = i / n
            f_prop = f + np.exp(logscale[1]) * (
                chols[1] @ rng.standard_normal(idx_f.size)) * 2.38 / np.sqrt(idx_f.size)
            a = x.copy(); a[idx_f] = f_prop                     # (x_slow, f')
            b = xs_end.copy(); b[idx_f] = f_prop                # (y_slow, f')
            lp0_p, _ = self._eager_logpost(a)   # host memoized (x_slow footprint)
            lp1_p, _ = self._eager_logpost(b)   # host memoized (y_slow footprint)
            d_interp = ((1. - lam) * lp0_p + lam * lp1_p) - ((1. - lam) * lp0_f + lam * lp1_f)
            if np.log(rng.uniform()) < d_interp:
                f, lp0_f, lp1_f = f_prop, lp0_p, lp1_p
        accept = np.log(rng.uniform()) < drag_sum / n
        if accept:
            x = xs_end.copy()
            x[idx_f] = f
            lp = lp1_f
        if adapting:
            gamma = 1. / np.sqrt(1. + it)
            logscale[0] += gamma * ((1. if accept else 0.) - 0.234)
        return x, lp, accept

    def run(self, nsteps=500, thin=1, burnin=0, resume=False):
        from ..config import host_eval
        rng = np.random.default_rng(
            int(jax.random.randint(self._next_key(), (), 0, 2 ** 31 - 1)))
        names = self.varied_params.names()
        scales = np.array([p.proposal if p.proposal else
                           (p.prior.std if p.prior is not None and np.isfinite(p.prior.std) else 1.)
                           for p in self.varied_params])
        nblocks = len(self._block_idx)
        with host_eval():
            if resume and getattr(self, '_state', None) is not None:
                xs, lps, logscale, chols, hist = self._state
            else:
                start, lp0 = self.get_start(self.nchains)
                xs = np.asarray(start, dtype='f8')
                lps = np.asarray(lp0, dtype='f8')
                logscale = np.zeros(nblocks)
                # initial per-block diagonal proposals from param scales
                chols = [np.diag(scales[idx]) for idx, _ in self._block_idx]
                hist = []
            records_x = np.empty((nsteps, self.nchains, len(names)))
            records_lp = np.empty((nsteps, self.nchains))
            naccept = nmoves = 0
            for it in range(nsteps):
                adapting = self.adapt and it < nsteps // 2 and not resume
                for ichain in range(self.nchains):
                    x, lp = xs[ichain].copy(), lps[ichain]
                    if self.drag:
                        x, lp, acc = self._drag_step(x, lp, rng, logscale, chols, adapting, it)
                        nmoves += 1
                        naccept += int(acc)
                        # fast block also gets its oversampled own updates
                        _, repeat = self._block_idx[1]
                        for _ in range(repeat):
                            x, lp, acc = self._block_step(1, x, lp, rng, logscale, chols, adapting, it)
                            nmoves += 1
                            naccept += int(acc)
                    else:
                        for iblock, (idx, repeat) in enumerate(self._block_idx):
                            for _ in range(repeat):
                                x, lp, acc = self._block_step(iblock, x, lp, rng, logscale, chols, adapting, it)
                                nmoves += 1
                                naccept += int(acc)
                    xs[ichain], lps[ichain] = x, lp
                records_x[it] = xs
                records_lp[it] = lps
                hist.append(xs.copy())
                # learned block covariance (Haario), refreshed periodically
                if adapting and it % 25 == 24:
                    h = np.concatenate(hist[len(hist) // 3:], axis=0)
                    for iblock, (idx, _) in enumerate(self._block_idx):
                        if h.shape[0] > max(20, 2 * idx.size):
                            cov = np.atleast_2d(np.cov(h[:, idx].T))
                            cov += 1e-8 * np.trace(cov) / idx.size * np.eye(idx.size)
                            try:
                                chols[iblock] = np.linalg.cholesky(cov)
                            except np.linalg.LinAlgError:
                                pass
        self._state = (xs, lps, logscale, chols, hist)
        self.diagnostics['acceptance_rate'] = naccept / max(nmoves, 1)
        sl = slice(burnin, None, thin)
        return self._make_chain(records_x[sl], {'logposterior': records_lp[sl]},
                                attrs={'sampler': 'blocked-mcmc',
                                       'blocks': [list(b) for b, _ in self.blocks],
                                       'acceptance_rate': self.diagnostics['acceptance_rate']})
