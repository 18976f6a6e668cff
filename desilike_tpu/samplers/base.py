"""Sampler base: vectorized posterior, start-point sampling, chain assembly.

Counterpart of reference samplers/base.py:69, re-designed TPU-first: the
likelihood is ONE pure jitted function; chains are a vmapped batch dimension
(the reference's vmap(jax)->jit->vmap(mpi) cascade, samplers/base.py:219-265,
collapses to jax.vmap); stepping loops are lax.scan on device; RNG is
counter-based jax.random so runs are bit-reproducible for a fixed seed and
mesh (BASELINE.json requirement).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import BaseClass
from ..samples.chain import Chain
from ..parameters import ParameterCollection


class Diagnostics(dict):
    """History of convergence quantities across check() calls, with
    ``stable_over`` semantics (reference samplers/base.py:671): each key
    maps to the per-check list of values; '<key>_test' tracks pass/fail
    and a criterion only counts as met once it has held for the last
    ``stable_over`` consecutive checks."""

    def add(self, key, value):
        self.setdefault(key, []).append(value)
        return value

    def is_stable(self, key, stable_over=1):
        vals = self.get(key, [])
        return len(vals) >= stable_over and all(bool(v) for v in vals[-stable_over:])

    def add_test(self, key, value, low=None, high=None, stable_over=1):
        """Record value + threshold test; returns the stable_over verdict.
        With no threshold set the quantity is recorded and passes."""
        self.add(key, value)
        if low is None and high is None:
            return True
        test = np.isfinite(value)
        if low is not None:
            test &= value > low
        if high is not None:
            test &= value < high
        self.add(key + '_test', bool(test))
        return self.is_stable(key + '_test', stable_over=stable_over)


class BasePosteriorSampler(BaseClass):
    """Common machinery: flat-vector posterior, ref-distribution starts."""

    def __init__(self, likelihood, seed=42, max_tries=1000, save_fn=None, chains=None,
                 mesh=None, mpicomm=None, ref_scale=None, rng=None):
        # mpicomm / rng are accepted for reference-script compatibility and
        # ignored: chain parallelism is a sharded mesh axis (mesh=), randomness
        # is the counter-based `seed`. ref_scale widens the start distribution.
        self.ref_scale = float(ref_scale) if ref_scale is not None else 1.
        self.likelihood = likelihood
        self.pipeline = likelihood.pipeline
        self.varied_params = self.pipeline.varied_params
        if not len(self.varied_params):
            raise ValueError('no varied parameters to sample')
        self.names = self.varied_params.names()
        self.ndim = len(self.names)
        self.save_fn = save_fn
        self.max_tries = int(max_tries)
        self.key = jax.random.key(seed)
        self._logpost_aux_fn = None
        self._resume_chain = chains if isinstance(chains, Chain) else (Chain.load(chains) if chains else None)
        self.mesh = mesh
        self.diagnostics = {}
        self.diagnostics_history = Diagnostics()

    def _cached_jit(self, key, builder):
        """Per-sampler cache of jitted kernels: every run() rebuilds its
        closures, so jax's own trace cache (keyed by function identity)
        misses and repeated runs — notably sample()'s convergence loop —
        recompile from scratch (~minutes on a remote TPU). Builders must
        close only over static sampler config; anything that changes
        between runs is passed as an argument or folded into ``key``."""
        cache = self.__dict__.setdefault('_jit_cache', {})
        if key not in cache:
            cache[key] = builder()
        return cache[key]

    def _shard_chains(self, *arrays):
        """Place per-chain batches on the sampler's mesh (sharded over the
        'chains' axis) so the vmapped jitted kernels partition across chips
        (computation follows data). No-op without a mesh. Per-chain math is
        elementwise over the batch axis, so a run is bit-identical however
        many devices the mesh has (SURVEY.md §2.11 determinism contract)."""
        if self.mesh is None:
            return arrays if len(arrays) > 1 else arrays[0]
        from ..parallel.mesh import shard_batch
        nbatch = jax.tree.leaves(arrays[0])[0].shape[0]
        ndev = self.mesh.size
        if nbatch % ndev:
            raise ValueError('chain batch size {} is not divisible by mesh size {}'.format(nbatch, ndev))
        out = tuple(shard_batch(a, self.mesh, axis=self.mesh.axis_names[0]) for a in arrays)
        return out if len(out) > 1 else out[0]

    def _mesh_gelman_rubin(self, positions):
        """On-device split-R over the sharded chain batch (cross-chip
        collectives when a mesh is set); recorded in diagnostics."""
        from ..parallel.mesh import chain_gelman_rubin
        gr = jax.jit(chain_gelman_rubin)(positions)
        self.diagnostics['gelman_rubin_mesh'] = np.asarray(gr)
        return gr

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # --- flat-vector posterior ---

    @property
    def _logpost_aux(self):
        if self._logpost_aux_fn is None:
            self._logpost_aux_fn = self.likelihood.logpost_fn()
        return self._logpost_aux_fn

    def logpost_flat(self, theta):
        """theta (ndim,) -> (logposterior, aux dict of scalars)."""
        lp, aux = self._logpost_aux(dict(zip(self.names, theta)))
        lp = jnp.where(jnp.isnan(lp), -jnp.inf, lp)
        keep = {}
        for name in ('loglikelihood', 'logprior'):
            if name in aux:
                keep[name] = aux[name]
        for name, val in aux.items():
            if name in ('loglikelihood', 'logprior', 'solved', 'solved_hessian'):
                continue
            if hasattr(val, 'ndim') and val.ndim == 0:
                keep[name] = val
        if 'solved' in aux:
            for sname, sval in aux['solved'].items():
                keep[sname] = sval
        if 'solved_hessian' in aux:
            keep['solved_hessian'] = aux['solved_hessian']
        return lp, keep

    def logpost_batch(self, thetas):
        """(n, ndim) -> ((n,), aux)."""
        return jax.vmap(self.logpost_flat)(thetas)

    # --- start points ---

    def get_start(self, nchains):
        """Rejection-sample start points from the parameters' reference
        distributions until the posterior is finite
        (reference samplers/base.py:274-323)."""
        start = np.empty((nchains, self.ndim))
        logpost = np.full(nchains, -np.inf)
        todo = np.ones(nchains, dtype=bool)
        batch_fn = jax.jit(lambda t: self.logpost_batch(t)[0])
        for itry in range(self.max_tries):
            if not todo.any():
                break
            n = int(todo.sum())
            draws = []
            for p in self.varied_params:
                d = np.asarray(p.sample_ref(self._next_key(), (n,)))
                if self.ref_scale != 1.:
                    # widen the reference distribution about the param value
                    # (reference base.py:113 ref.affine_transform(scale=...))
                    center = float(p.value)
                    d = center + self.ref_scale * (d - center)
                    lims = p.prior.limits if p.prior is not None else (-np.inf, np.inf)
                    if np.isfinite(lims).any():
                        d = np.clip(d, lims[0], lims[1])
                draws.append(d)
            draws = np.column_stack(draws)
            lps = np.asarray(batch_fn(jnp.asarray(draws)))
            good = np.isfinite(lps)
            idx = np.flatnonzero(todo)[good]
            start[idx] = draws[good]
            logpost[idx] = lps[good]
            todo[idx] = False
        if todo.any():
            raise ValueError('could not find finite posterior start points in {} tries'.format(self.max_tries))
        return jnp.asarray(start), jnp.asarray(logpost)

    # --- chain assembly ---

    def _make_chain(self, positions, records, attrs=None):
        """positions: (nsteps, nchains, ndim); records: dict name -> (nsteps, nchains[, ...])."""
        chain = Chain()
        positions = np.asarray(positions)
        for i, p in enumerate(self.varied_params):
            chain[p] = positions[..., i]
        for name, val in records.items():
            val = np.asarray(val)
            if name == 'solved_hessian':
                chain.attrs['solved_hessian'] = val.reshape(-1, val.shape[-2], val.shape[-1])
                continue
            param = self.pipeline.params.get(name)
            if param is not None:
                chain[param] = val
            else:
                chain[name] = val
        solved_names = self.pipeline.solved_params.names()
        if solved_names:
            chain.attrs['solved_names'] = solved_names
        chain.attrs.update(attrs or {})
        if self._resume_chain is not None:
            chain = Chain.concatenate([self._resume_chain, chain], axis=0)
        if self.save_fn:
            chain.save(self.save_fn)
        return chain

    def sample(self, max_iterations=10000, check_every=500, min_iterations=1000,
               max_gr=1.05, min_ess=200, thin=1, check=None, **run_kwargs):
        """Batch loop with convergence checking (reference
        BaseBatchPosteriorSampler.run, samplers/base.py:409): run
        ``check_every`` steps at a time, concatenating chains, until
        the check() suite converges or max_iterations is reached. ``check``
        forwards extra criteria (max_geweke, max_cl_gr, max_dact,
        stable_over, ...) to :meth:`check`."""
        chain = None
        done = 0
        check = dict(check or {})
        while done < max_iterations:
            n = min(check_every, max_iterations - done)
            new = self.run(nsteps=n, thin=thin, resume=done > 0, **run_kwargs)
            chain = new if chain is None else type(new).concatenate([chain, new], axis=0)
            done += n
            if done >= min_iterations and self.check(chain, max_gr=max_gr, min_ess=min_ess, **check):
                break
        if self.save_fn:
            chain.save(self.save_fn)
        return chain

    def check(self, chain, params=None, max_gr=1.03, min_ess=100, burnin=0.5,
              nsplits=2, stable_over=1, max_eigen_gr=None, max_cl_gr=None,
              nsigmas_cl=1., max_geweke=None, min_geweke_pvalue=None,
              max_dact=None):
        """Convergence check suite (reference samplers/base.py:504-726).

        Always run: split-chain diagonal Gelman-Rubin (< ``max_gr``) and
        min ESS over params (> ``min_ess``). Opt-in (set the threshold):

        - ``max_eigen_gr``: multivariate (eigenvalue) GR < threshold,
        - ``max_cl_gr``: GR of the ``nsigmas_cl``-sigma interval EDGES <
          threshold — catches chains whose means agree but whose tails are
          still growing,
        - ``max_geweke``: max |Geweke z| over params and chains < threshold
          — catches within-segment drift that split-GR + ESS miss,
        - ``min_geweke_pvalue``: normality p-value of the z-scores,
        - ``max_dact``: max relative change of the per-param integrated
          autocorrelation time since the previous check() < threshold
          (IAT stability window).

        Every quantity and its pass/fail is appended to
        ``self.diagnostics_history`` (a :class:`Diagnostics` dict of
        per-check lists); with ``stable_over=n`` each criterion must hold
        for the last ``n`` consecutive checks. Returns the combined bool;
        ``self.diagnostics`` keeps the latest values for quick access.
        """
        from ..samples import diagnostics as diag
        params = params or self.names
        D = self.diagnostics_history
        burned = chain.remove_burnin(burnin)
        # (nchains * nsplits, nsub, ndim) split-chain stack
        arr = np.stack([np.asarray(burned[p], dtype='f8') for p in params], axis=-1)
        if arr.ndim == 2:
            arr = arr[:, None]
        pc = np.moveaxis(arr, 0, 1)              # (nchains, nsteps, ndim)
        nsub = pc.shape[1] // nsplits
        splits = np.concatenate([pc[:, i * nsub:(i + 1) * nsub] for i in range(nsplits)], axis=0)

        ok = True
        gr = np.asarray(diag.gelman_rubin(splits, method='diag'))
        self.diagnostics['gelman_rubin'] = gr
        ok &= D.add_test('diag_gr', float(gr.max()), high=max_gr, stable_over=stable_over)
        if max_eigen_gr is not None:
            try:
                egr = float(diag.gelman_rubin(splits, method='eigen'))
            except np.linalg.LinAlgError:
                egr = np.nan
            ok &= D.add_test('eigen_gr', egr, high=max_eigen_gr, stable_over=stable_over)
        if max_cl_gr is not None:
            from scipy import stats as sps
            qs = sps.norm.cdf([-nsigmas_cl, nsigmas_cl])
            cl_gr = max(
                float(np.max(diag.gelman_rubin_statistic(
                    splits, lambda c, q=q: np.quantile(c, q, axis=0)))) for q in qs)
            ok &= D.add_test('cl_gr', cl_gr, high=max_cl_gr, stable_over=stable_over)
        iact = np.array([diag.integrated_autocorrelation_time(pc[..., i])
                         for i in range(pc.shape[-1])])
        D.add('iact', iact)
        # Geweke z-scores use an iid standard error; correct by sqrt(IAT) so
        # converged-but-autocorrelated chains read ~N(0, 1) (the normality
        # p-value below is scale-free and needs no correction)
        zscores = np.concatenate([
            np.atleast_1d(diag.geweke(pc[..., i], first=0.1, last=0.5))
            / np.sqrt(max(float(iact[i]), 1.)) for i in range(pc.shape[-1])])
        self.diagnostics['geweke'] = float(np.max(np.abs(zscores)))
        if max_geweke is not None:
            ok &= D.add_test('geweke', self.diagnostics['geweke'],
                             high=max_geweke, stable_over=stable_over)
        if min_geweke_pvalue is not None:
            ok &= D.add_test('geweke_pvalue', diag.geweke_pvalue(zscores),
                             low=min_geweke_pvalue, stable_over=stable_over)
        ess = float(pc.shape[0] * pc.shape[1] / max(float(iact.max()), 1.))
        self.diagnostics['ess'] = ess
        ok &= D.add_test('ess', ess, low=min_ess, stable_over=stable_over)
        if max_dact is not None:
            hist = D['iact']
            dact = (float(np.max(np.abs(hist[-2] / iact - 1.)))
                    if len(hist) >= 2 else np.inf)
            ok &= D.add_test('dact', dact, high=max_dact, stable_over=stable_over)
        converged = bool(ok)
        self.diagnostics['converged'] = converged
        return converged
