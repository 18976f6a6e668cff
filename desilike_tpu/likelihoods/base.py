"""Likelihoods: Gaussian likelihood + analytic marginalization over linear
nuisance parameters.

Counterpart of reference likelihoods/base.py. The reference's FastFisher
(likelihoods/base.py:21-200) re-runs a copied sub-pipeline under jax.jacfwd
per evaluation; here the solve is fused into the single traced posterior:

  1. run the pipeline once at the solved params' expansion point via
     ``jax.linearize`` -> whitened residuals d_i and a jvp closure,
  2. push the nsolved basis tangents (vmapped) -> design matrices J_i,
  3. Newton solve dx = -H^{-1} g with H = prior_hess - sum_i J_i J_i^T,
     g = prior_grad - sum_i J_i d_i (whitened space: precision = identity),
  4. loglike += 1/2 dx^T H_i dx + g_i . dx per likelihood ('.best'/'.marg'),
     plus -1/2 logdet(-H_marg) for '.marg' parameters
     (matches reference _solve, likelihoods/base.py:314-413).

Data covariances are Cholesky-whitened host-side in float64 (with the
Hartlap 2007 factor when estimated from mocks), so the traced path is
float32-stable.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..core import Calculator
from ..parameters import Parameter, ParameterCollection
from ..ops.linalg import whiten_factor
from ..utils import is_sequence


class BaseLikelihood(Calculator):
    """Base likelihood: get() returns log-posterior; derived loglikelihood/logprior."""

    _params = {'loglikelihood': dict(derived=True, latex=r'\ln\mathcal{L}'),
               'logprior': dict(derived=True, latex=r'\ln p')}
    solved_default = '.marg'
    name = None

    @property
    def likelihoods(self):
        return [self]

    def get(self):
        return self.loglikelihood

    def __add__(self, other):
        return SumLikelihood(likelihoods=self.likelihoods + other.likelihoods)

    # --- compiled posterior with analytic marginalization ---

    def _solved_setup(self, pipe):
        solved_all = pipe.solved_params
        prec_params = [p for p in solved_all
                       if p.derived.split('_not_derived')[0] == '.prec']
        if prec_params:
            self._fold_precision(pipe, prec_params)
        solved = ParameterCollection([p for p in solved_all if p not in prec_params])
        names = solved.names()
        marg_idx, best_idx = [], []
        loc = np.zeros(len(names))
        prec = np.zeros(len(names))
        for i, p in enumerate(solved):
            status = p.derived.split('_not_derived')[0]
            if status == '.auto':
                status = self.solved_default
            if status == '.marg':
                marg_idx.append(i)
            elif status == '.best':
                best_idx.append(i)
            if p.prior is not None and p.prior.dist == 'norm':
                loc[i] = p.prior.loc
                prec[i] = p.prior.scale ** -2
        return names, solved, np.array(marg_idx, dtype='i4'), loc, prec

    def _fold_precision(self, pipe, prec_params):
        """'.prec' parameters: marginalized ONCE at initialization into the
        data covariance (reference _marginalize_precision,
        likelihoods/base.py:257-312). For a linear parameter s ~ N(loc, sig)
        with theory t(s) = t(loc) + b (s - loc), marginalizing is exactly
        C -> C + sig^2 b b^T with s pinned at loc. Requires static-linear
        contributions (true for broadband/stochastic terms)."""
        from ..config import host_eval
        defaults = pipe.input_defaults()
        gauss = [like for like in self.likelihoods if hasattr(like, 'flatdata')]

        def theory_at(overrides):
            full = dict(defaults)
            for p in prec_params:
                full[p.name] = p.prior.loc if p.prior is not None else 0.
            full.update(overrides)
            full = {k: jnp.asarray(v) for k, v in full.items()}
            pipe.run_once(full)
            return [np.asarray(like.flattheory() if callable(getattr(like, 'flattheory', None))
                               else like.flattheory, dtype='f8') for like in gauss]

        with jax.ensure_compile_time_eval(), host_eval():
            base = theory_at({})
            # one perturbed pipeline run per param (loop-invariant in `like`)
            pert = {}
            for p in prec_params:
                loc = p.prior.loc if p.prior is not None else 0.
                sig = p.prior.scale if p.prior is not None else np.inf
                if not np.isfinite(sig):
                    raise ValueError('.prec parameter {} needs a proper normal prior'.format(p.name))
                pert[p.name] = theory_at({p.name: loc + 1.})
            for ilike, (like, t0) in enumerate(zip(gauss, base)):
                # fold from the UNFOLDED covariance so rebuilding logpost_fn
                # (or changing the .prec set) never double-inflates
                prefold = getattr(like, '_covariance_prefold', None)
                if prefold is None:
                    prefold = np.array(like.covariance, dtype='f8')
                    like._covariance_prefold = prefold
                cov = prefold.copy()
                for p in prec_params:
                    sig = p.prior.scale if p.prior is not None else np.inf
                    b = pert[p.name][ilike] - t0
                    if np.any(b != 0.):
                        cov = cov + sig ** 2 * np.outer(b, b)
                like._set_whitening(cov, hartlap=getattr(like, 'hartlap', 1.))
        # pin the folded params at their prior centers (they stay '.prec'
        # solved, i.e. excluded from sampling; the fold above is exact)
        for p in prec_params:
            pipe.params[p.name].update(value=p.prior.loc if p.prior is not None else 0.)

    def _static_linear_indices(self, pipe, solved, likelihoods=()):
        """Indices of solved params whose theory contribution is exactly
        linear with a static basis (e.g. BAO broadband towers): their design
        matrix J is a compile-time constant (SURVEY.md §7 item 5), so no
        per-evaluation tangents are needed."""
        import fnmatch
        nonlinear = self._nonlinear_transform_calcs(likelihoods)
        static = []
        for i, p in enumerate(solved):
            if any(p.name in calc.runtime_info.params for calc in nonlinear):
                # the data-side transform (e.g. 'cubic' gaussianization) makes
                # flatdiff nonlinear even in exactly-linear theory params: a
                # unit-step secant J would be wrong — take the linearize path,
                # which differentiates through the transform (reference
                # behavior: FastFisher jacfwd's flatdiff per evaluation)
                continue
            owners = pipe._param_owners.get(p.name, [])
            for owner in owners:
                patterns = getattr(owner, '_static_linear_solved', ())
                if any(fnmatch.fnmatch(p.basename, pat) for pat in patterns):
                    static.append(i)
                    break
        return static

    @staticmethod
    def _nonlinear_transform_calcs(likelihoods):
        """Calculators inside the subgraph of any observable carrying a
        nonlinear data-side transform (TracerPowerSpectrumMultipolesObservable
        transform='cubic'): solved params touching these may not use static
        design matrices or primal analytic basis rows."""
        calcs = []
        for like in likelihoods:
            for obs in getattr(like, 'observables', ()):
                if getattr(obs, 'transform', None) is not None:
                    from ..core import Pipeline
                    calcs.extend(Pipeline(obs).calculators)
        return calcs

    def _compute_static_J(self, pipe, names, static_idx, likelihoods):
        """Exact constant design matrices via unit-step differences (exact for
        linear contributions), host-side at build time. Guarded against being
        staged into an enclosing trace (logpost_fn may be built lazily inside
        a jit)."""
        defaults = pipe.input_defaults()

        def diffs_at(overrides):
            full = dict(defaults)
            full.update(overrides)
            full = {k: jnp.asarray(v) for k, v in full.items()}
            pipe.run_once(full)
            return [np.asarray(like.flatdiff_white, dtype='f8') for like in likelihoods
                    if hasattr(like, 'flatdiff_white')]

        from ..config import host_eval
        with jax.ensure_compile_time_eval(), host_eval():
            base = diffs_at({})
            Js = [np.zeros((len(static_idx), len(b))) for b in base]
            for row, i in enumerate(static_idx):
                name = names[i]
                plus = diffs_at({name: defaults[name] + 1.})
                for ilike, (b, pl) in enumerate(zip(base, plus)):
                    Js[ilike][row] = pl - b
        return Js

    def _analytic_basis_plan(self, pipe, solved, dyn_idx, likelihoods):
        """For dynamically-solved params whose theory exposes
        ``solved_power_basis`` (exactly-linear terms with traced bases, e.g.
        EFT counterterms x pk11), the J rows can be computed in the primal
        run — no linearize tangents. Returns (analytic_idx, plan) where plan
        maps solved index -> list over likelihoods of basis getters (None =
        zero rows)."""
        gauss = [like for like in likelihoods if hasattr(like, 'flatdata')]
        plan = {}
        analytic = []
        for i in dyn_idx:
            p = solved[i]
            getters = []
            ok = True
            for like in gauss:
                getter = getattr(like, 'solved_flat_basis_fn', None)
                g = getter(p) if getter is not None else None
                if g is False:   # param affects this likelihood, no analytic basis
                    ok = False
                    break
                getters.append(g)   # callable or None (zero rows)
            if ok and any(g is not None for g in getters):
                analytic.append(i)
                plan[i] = getters
        return analytic, plan

    def logpost_fn(self, jit=True):
        """Pure function {varied name: value} -> (logposterior, aux dict).

        aux contains 'loglikelihood', 'logprior', derived parameters, and for
        solved parameters their analytic best-fit values 'solved' and the
        posterior hessian 'solved_hessian' (for Chain.sample_solved).
        """
        pipe = self.pipeline
        names, solved, marg_idx, prior_loc, prior_prec = self._solved_setup(pipe)
        likelihoods = self.likelihoods
        nsolved = len(names)
        # Percival 2014 factor for mock-estimated covariances (reference
        # likelihoods/base.py:633-656): inflates the data precision by
        # 1/m with m depending on (nmocks, ndata, nvaried). Recomputed from
        # the UNSCALED whitening at every logpost_fn build so the factor
        # always reflects the current pipeline's nvaried (idempotent; a
        # stale factor from an earlier build cannot leak through).
        for like in likelihoods:
            nm = getattr(like, '_nmocks', 0)
            if nm:
                nd = like.size
                if nm < nd + 5:
                    # outside the Percival validity regime: degrade to the
                    # Hartlap-only factor with a warning, like the reference
                    # (likelihoods/base.py:633-656) — don't hard-fail a config
                    # the reference runs
                    self.log.warning(
                        'Percival 2014 factor needs nmocks > ndata + 4 (got nmocks={}, '
                        'ndata={}); applying the Hartlap factor only'.format(nm, nd))
                    like._whiten = like._whiten_base
                    like.precision = like._precision_base
                    continue
                nv = len(pipe.varied_params) + nsolved
                A = 2. / ((nm - nd - 1.) * (nm - nd - 4.))
                B = (nm - nd - 2.) / ((nm - nd - 1.) * (nm - nd - 4.))
                m = (1. + B * (nd - nv)) / (1. + A + B * (nv + 1.))
                like._whiten = like._whiten_base / np.sqrt(m)
                like.precision = like._precision_base / m
        static_idx = self._static_linear_indices(pipe, solved, likelihoods) if nsolved else []
        dyn_idx = [i for i in range(nsolved) if i not in static_idx]
        analytic_idx, basis_plan = self._analytic_basis_plan(pipe, solved, dyn_idx, likelihoods) if dyn_idx else ([], {})
        dyn_idx = [i for i in dyn_idx if i not in analytic_idx]
        static_Js = None
        if static_idx:
            static_Js = self._compute_static_J(pipe, names, static_idx, likelihoods)

        def fn(values):
            full = pipe._resolve_values(values)
            aux = {}
            if nsolved == 0:
                _, derived = pipe.run_once(full)
                loglike = sum(like.loglikelihood for like in likelihoods)
                logprior = pipe.logprior(full)
                aux.update(derived)
                aux['loglikelihood'] = loglike
                aux['logprior'] = logprior
                return loglike + logprior, aux

            s0 = jnp.stack([jnp.asarray(full[n], dtype=jnp.result_type(float)) for n in names])

            def inner(svec_dyn):
                f2 = dict(full)
                f2.update((names[i], v) for i, v in zip(dyn_idx, svec_dyn))
                _, derived = pipe.run_once(f2)
                diffs = tuple(like.flatdiff_white for like in likelihoods
                              if hasattr(like, 'flatdiff_white'))
                # anything read from node state after this function returns
                # must be RETURNED here — attributes set inside jax.linearize
                # are leaked tracers outside it.  NO stop_gradient: both the
                # non-Gaussian loglikes and the analytic basis rows depend on
                # the VARIED parameters (e.g. bases ~ pk11(qpar, df, ...)), so
                # the posterior gradient must flow through them; their
                # tangents w.r.t. the solved directions are ~0 anyway.
                other_ll = tuple(like.loglikelihood for like in likelihoods
                                 if not hasattr(like, 'flatdiff_white'))
                abases = tuple(tuple(None if g is None else g()
                                     for g in basis_plan[i]) for i in analytic_idx)
                return diffs, (derived, other_ll, abases)

            s0_dyn = s0[jnp.asarray(dyn_idx, dtype=jnp.int32)] if dyn_idx else jnp.zeros((0,), s0.dtype)
            if dyn_idx:
                (diffs, (derived, other_ll, abases)), jvp = jax.linearize(inner, s0_dyn)
                basis = jnp.eye(len(dyn_idx), dtype=s0.dtype)
                Js_dyn = jax.vmap(lambda t: jvp(t)[0])(basis)  # tuple of (ndyn, ndata_i)
            else:
                diffs, (derived, other_ll, abases) = inner(s0_dyn)
                Js_dyn = tuple(jnp.zeros((0, d.shape[0]), d.dtype) for d in diffs)
            # assemble full J per likelihood: constant rows for static-linear
            # params, analytic-basis rows (from the primal), traced rows for
            # the rest, in solved order
            Js = []
            for ilike, d in enumerate(diffs):
                J = jnp.zeros((nsolved, d.shape[0]), d.dtype)
                if static_idx:
                    J = J.at[jnp.asarray(static_idx, dtype=jnp.int32)].set(
                        jnp.asarray(static_Js[ilike], dtype=d.dtype))
                if dyn_idx:
                    J = J.at[jnp.asarray(dyn_idx, dtype=jnp.int32)].set(Js_dyn[ilike])
                for ii, i in enumerate(analytic_idx):
                    gval = abases[ii][ilike]
                    if gval is not None:
                        J = J.at[i].set(jnp.asarray(gval, d.dtype))
                Js.append(J)
            Js = tuple(Js)

            prior_grad = -jnp.asarray(prior_prec) * (s0 - jnp.asarray(prior_loc))
            prior_hess = -jnp.diag(jnp.asarray(prior_prec))
            g = prior_grad
            H = prior_hess
            like_g, like_H = [], []
            for J, d in zip(Js, diffs):
                gi = -J @ d
                Hi = -J @ J.T
                like_g.append(gi)
                like_H.append(Hi)
                g = g + gi
                H = H + Hi
            # Jacobi equilibration: the solved basis (e.g. broadband powers
            # k^-3..k^1) can be wildly scaled; rescaling by sqrt(diag(-H))
            # reduces the condition number to that of the correlation matrix,
            # keeping the Newton solve float32-stable on TPU. The solve and
            # logdet use the unrolled small-matrix Cholesky (ops/linalg.py):
            # LAPACK custom-calls under vmap cost ~5x the whole pipeline.
            from ..ops.linalg import chol_small, chol_solve_small, chol_logdet_small
            scale = 1. / jnp.sqrt(jnp.clip(-jnp.diag(H), 1e-30, None))
            Hs = H * scale[:, None] * scale[None, :]
            Ls = chol_small(-Hs)
            dxs = chol_solve_small(Ls, g * scale)
            dx = scale * dxs
            x = s0 + dx

            loglike = jnp.zeros(())
            iw = io = 0
            for like in likelihoods:
                if hasattr(like, 'flatdiff_white'):
                    d = diffs[iw]
                    ll = -0.5 * d @ d
                    ll = ll + 0.5 * dx @ like_H[iw] @ dx + like_g[iw] @ dx
                    iw += 1
                else:
                    ll = other_ll[io]
                    io += 1
                loglike = loglike + ll
            if marg_idx.size:
                # logdet in the equilibrated basis + scale correction:
                # logdet(-H_m) = logdet(-Hs_m) - 2 sum(log scale_m)
                if len(marg_idx) == nsolved:
                    ld_s = chol_logdet_small(Ls)
                    scale_m = scale
                else:
                    midx = jnp.asarray(marg_idx)
                    Hsm = Hs[jnp.ix_(midx, midx)]
                    ld_s = chol_logdet_small(chol_small(-Hsm))
                    scale_m = scale[midx]
                logdet = ld_s - 2. * jnp.sum(jnp.log(scale_m))
                loglike = loglike - 0.5 * logdet

            logprior = pipe.logprior(full)
            for i, p in enumerate(solved):
                if p.prior is not None:
                    logprior = logprior + p.prior.logpdf(x[i])

            aux.update(derived)
            aux['loglikelihood'] = loglike
            aux['logprior'] = logprior
            aux['solved'] = dict(zip(names, x))
            aux['solved_hessian'] = H
            return loglike + logprior, aux

        return jax.jit(fn) if jit else fn

    def logpost(self, **values):
        """Convenience scalar evaluation."""
        if '_logpost_fn' not in self.__dict__:
            self.__dict__['_logpost_fn'] = self.logpost_fn()
        fn = self.__dict__['_logpost_fn']
        values = {k: jnp.asarray(v) for k, v in values.items()}
        out, _ = fn(values)
        return out


class BaseGaussianLikelihood(BaseLikelihood):
    r"""Gaussian likelihood of a flat data vector.

    loglike = -1/2 (t - d)^T C^{-1} (t - d), computed on the whitened
    residual (reference likelihoods/base.py:465).
    """

    def initialize(self, data=None, covariance=None, precision=None, **kwargs):
        self.flatdata = np.ravel(np.asarray(data, dtype='f8'))
        if precision is not None:
            precision = np.atleast_2d(np.asarray(precision, dtype='f8'))
            covariance = np.linalg.inv(precision)
        if covariance is None:
            raise ValueError('provide covariance or precision')
        covariance = np.atleast_2d(np.asarray(covariance, dtype='f8'))
        self._set_whitening(covariance)

    def _set_whitening(self, covariance, hartlap=1.):
        self.covariance = covariance
        self.precision = np.linalg.inv(covariance) * hartlap
        self._whiten = whiten_factor(covariance) * np.sqrt(hartlap)
        # pre-Percival base factors (logpost_fn rescales from these)
        self._precision_base = self.precision
        self._whiten_base = self._whiten

    def flattheory(self):
        raise NotImplementedError

    def calculate(self, **params):
        diff = self.flattheory() - jnp.asarray(self.flatdata)
        self.flatdiff = diff
        self.flatdiff_white = jnp.asarray(self._whiten, dtype=diff.dtype) @ diff
        self.loglikelihood = -0.5 * self.flatdiff_white @ self.flatdiff_white

    @property
    def size(self):
        return len(self.flatdata)

    @property
    def nvaried(self):
        pipe = self.pipeline
        return len(pipe.varied_params) + len(pipe.solved_params)

    @property
    def ndof(self):
        """Degrees of freedom: data size minus varied+solved parameters
        (reference likelihoods/base.py nvaried/ndof)."""
        return self.size - self.nvaried


class ObservablesGaussianLikelihood(BaseGaussianLikelihood):
    """Gaussian likelihood over a list of observables
    (reference likelihoods/base.py:504).

    covariance: explicit matrix, or None -> from observables (mocks or
    attached covariance) or computed analytically from ``footprints``.
    Hartlap 2007 factor applied when the covariance is mock-estimated.
    """

    def initialize(self, observables=None, covariance=None, footprints=None,
                   scale_covariance=1., name=None, **kwargs):
        if not is_sequence(observables):
            observables = [observables]
        self.observables = list(observables)
        self.name = name
        for obs in self.observables:
            obs.runtime_info.initialize()
        nobs = [len(obs.flatdata) for obs in self.observables]
        self.flatdata = np.concatenate([obs.flatdata for obs in self.observables])
        nmocks = 0
        if covariance is not None and hasattr(covariance, 'hartlap2007_factor'):
            # ObservableCovariance: unwrap matrix + mock count
            nmocks = covariance.nobs or 0
            covariance = covariance.value
        if covariance is None:
            covs = [obs.covariance for obs in self.observables]
            if all(c is not None for c in covs):
                covariance = np.zeros((sum(nobs), sum(nobs)))
                start = 0
                if len(self.observables) == 1:
                    # single covariance: global Hartlap/Percival path below
                    covariance[:, :] = np.asarray(covs[0], dtype='f8')
                    nmocks = self.observables[0].nmocks or 0
                else:
                    # block-diagonal from SEPARATELY-estimated per-observable
                    # covariances: each mock-estimated block carries ITS OWN
                    # Hartlap factor with its own (nmocks, block size) — a
                    # global factor with the total data size would
                    # over-correct or spuriously fail. No joint Percival
                    # factor is defined for separate estimates (nmocks = 0).
                    for obs, c, n in zip(self.observables, covs, nobs):
                        c = np.asarray(c, dtype='f8')
                        nm = obs.nmocks
                        if nm:
                            h = (nm - n - 2.) / (nm - 1.)
                            if h <= 0:
                                raise ValueError('too few mocks ({}) for observable block size {}'.format(nm, n))
                            c = c / h   # folds the per-block Hartlap into the precision
                        covariance[start:start + n, start:start + n] = c
                        start += n
            elif footprints is not None:
                from ..observables.covariance import ObservablesCovarianceMatrix
                covariance = ObservablesCovarianceMatrix(self.observables, footprints=footprints)()
            else:
                raise ValueError('provide covariance, observables with covariance/mocks, or footprints')
        covariance = np.atleast_2d(np.asarray(covariance, dtype='f8')) * scale_covariance
        hartlap = 1.
        if nmocks:
            hartlap = (nmocks - len(self.flatdata) - 2.) / (nmocks - 1.)
            if hartlap <= 0:
                raise ValueError('too few mocks ({}) for data size {}'.format(nmocks, len(self.flatdata)))
        self.hartlap = hartlap
        self._nmocks = nmocks
        self._set_whitening(covariance, hartlap=hartlap)

    def flattheory(self):
        return jnp.concatenate([obs.flattheory for obs in self.observables])

    def calculate(self, **params):
        super().calculate(**params)

    def solved_flat_basis_fn(self, param):
        """Analytic whitened J-row getter for an exactly-linear solved param
        whose theory exposes ``solved_power_basis`` (e.g. EFT counterterms):
        returns a callable (evaluated post-calculate, traced), None if the
        param does not touch this likelihood, or False if it does but no
        analytic basis is available (falls back to linearize)."""
        # per-observable calculator lists are cached: this runs once per
        # (solved param, likelihood) at every logpost_fn build
        calcs_cache = self.__dict__.get('_obs_calcs_cache')
        if calcs_cache is None or len(calcs_cache) != len(self.observables):
            from ..core import Pipeline
            calcs_cache = [list(Pipeline(obs).calculators) for obs in self.observables]
            self.__dict__['_obs_calcs_cache'] = calcs_cache
        per_obs = []
        touches = False
        for obs, calcs in zip(self.observables, calcs_cache):
            wmat = getattr(obs, 'wmatrix', None)
            theory = getattr(wmat, 'theory', None)
            owns = any(param.name in calc.runtime_info.params for calc in calcs)
            if not owns:
                per_obs.append(None)
                continue
            touches = True
            if getattr(obs, 'transform', None) is not None:
                # nonlinear data-side transform: the primal basis rows
                # (whiten @ W @ basis) would omit the transform's chain-rule
                # factor — fall back to linearize, which carries it exactly
                return False
            supported = getattr(theory, 'solved_basis_names', ())
            if theory is None or param.basename not in supported:
                return False
            per_obs.append((obs, theory))
        if not touches:
            return None

        basename = param.basename

        def getter():
            rows = []
            for entry, obs in zip(per_obs, self.observables):
                n = len(obs.flatdata)
                if entry is None:
                    rows.append(jnp.zeros(n))
                else:
                    o, theory = entry
                    basis = theory.solved_power_basis(basename)
                    W = jnp.asarray(o.wmatrix.wmatrix, dtype=basis.dtype)
                    rows.append(W @ basis.reshape(-1))
            flat = jnp.concatenate(rows)
            return jnp.asarray(self._whiten, dtype=flat.dtype) @ flat
        return getter


class FisherGaussianLikelihood(BaseGaussianLikelihood):
    """Compressed Gaussian likelihood from a Fisher forecast
    (reference fisher.py:31): data = Fisher center, precision = F, theory =
    the parameter vector itself. Re-usable as a pipeline node."""

    def initialize(self, fisher=None, **kwargs):
        if fisher is None:
            raise ValueError('provide a LikelihoodFisher')
        self._names = fisher.names()
        for p in fisher.params:
            self.params.set(p.clone(fixed=False, derived=False))
        super().initialize(data=fisher.center, covariance=fisher.covariance())

    def flattheory(self):
        return jnp.stack([self._values[n] for n in self._names])

    def calculate(self, **params):
        self._values = {}
        for n in self._names:
            base = n.split('.')[-1]
            self._values[n] = jnp.asarray(params.get(n, params.get(base, 0.)))
        super().calculate()


class SumLikelihood(BaseLikelihood):
    """Sum of independent likelihoods (reference likelihoods/base.py:715)."""

    def initialize(self, likelihoods=None, **kwargs):
        if not is_sequence(likelihoods):
            likelihoods = [likelihoods]
        self._likelihoods = list(likelihoods)
        self.requires = list(self._likelihoods)

    @property
    def likelihoods(self):
        if '_likelihoods' not in self.__dict__:
            # not yet initialized (lazy lifecycle): read the init config so
            # chained sums (a + b + c) flatten correctly
            likes = self.init.get('likelihoods')
            return list(likes) if is_sequence(likes) else [likes]
        return list(self._likelihoods)

    def calculate(self, **params):
        self.loglikelihood = sum(like.loglikelihood for like in self._likelihoods)
