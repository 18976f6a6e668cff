"""Fisher forecasting: F = J^T P J with native autodiff.

Counterpart of reference fisher.py:642 (Fisher), :63 (LikelihoodFisher),
:31 (FisherGaussianLikelihood). The Gaussian path computes the whitened
design matrix in ONE ``jax.jacfwd`` over all varied parameters — the
reference's MPI-scattered finite-difference grid disappears.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .utils import BaseClass
from .parameters import ParameterCollection, Parameter


class LikelihoodFisher(BaseClass):
    """Fisher information container: center, hessian, algebra, exports
    (reference fisher.py:63)."""

    def __init__(self, center, params, hessian, gradient=None, offset=0.):
        self.params = ParameterCollection(params)
        self._names = self.params.names()
        self.center = np.asarray(center, dtype='f8')
        self.hessian = np.atleast_2d(np.asarray(hessian, dtype='f8'))  # of loglikelihood (negative definite)
        self.gradient = np.zeros(len(self._names)) if gradient is None else np.asarray(gradient, dtype='f8')
        self.offset = float(offset)

    def names(self):
        return list(self._names)

    def index(self, params):
        return [self._names.index(getattr(p, 'name', p)) for p in params]

    @property
    def precision(self):
        """Fisher matrix F = -H."""
        return -self.hessian

    def covariance(self, params=None):
        cov = np.linalg.inv(self.precision)
        if params is not None:
            idx = self.index(params)
            cov = cov[np.ix_(idx, idx)]
        return cov

    def std(self, param):
        return np.sqrt(self.covariance([param])[0, 0])

    def fom(self, params=None):
        """Figure of merit: 1/sqrt(det C)."""
        return 1. / np.sqrt(np.linalg.det(self.covariance(params)))

    def marginalize(self, params):
        """Marginalize over ``params``: drop them from the covariance."""
        keep = [n for n in self._names if n not in [getattr(p, 'name', p) for p in params]]
        idx = self.index(keep)
        cov = self.covariance()[np.ix_(idx, idx)]
        hessian = -np.linalg.inv(cov)
        center = self.center[idx]
        return LikelihoodFisher(center, [self.params[n] for n in keep], hessian)

    def fix(self, params):
        """Condition on ``params`` fixed at center: drop rows/cols of F."""
        keep = [n for n in self._names if n not in [getattr(p, 'name', p) for p in params]]
        idx = self.index(keep)
        hessian = self.hessian[np.ix_(idx, idx)]
        return LikelihoodFisher(self.center[idx], [self.params[n] for n in keep], hessian)

    def _solve(self):
        """Newton step dx with H dx = g (reference fisher.py:216)."""
        try:
            return np.linalg.solve(self.hessian, self.gradient)
        except np.linalg.LinAlgError as exc:
            raise ValueError('singular hessian for parameters {}'.format(self._names)) from exc

    def mean(self, params=None, return_type='nparray'):
        """Likelihood mean = center - H^-1 g (reference fisher.py:229)."""
        mean = self.center - self._solve()
        if params is not None:
            mean = mean[self.index(params if isinstance(params, (list, tuple)) else [params])]
            if not isinstance(params, (list, tuple)):
                return float(mean[0])
        if return_type == 'dict':
            names = self._names if params is None else [getattr(p, 'name', p) for p in params]
            return dict(zip(names, mean))
        return mean

    def chi2min(self):
        r"""Minimum chi^2 = -2 loglike at the mean (reference fisher.py:224)."""
        flatdiff = -self._solve()
        return -2. * (self.offset + self.gradient.dot(flatdiff)
                      + 0.5 * flatdiff.dot(self.hessian).dot(flatdiff))

    def choice(self, index='mean', params=None, return_type='dict'):
        """Mean point as dict/array (reference fisher.py:288)."""
        mean = self.mean(params=params if params is not None else None)
        names = self._names if params is None else [getattr(p, 'name', p) for p in params]
        if return_type == 'dict':
            return dict(zip(names, np.atleast_1d(mean)))
        return np.atleast_1d(mean)

    def var(self, params=None):
        """Marginalized variances (reference fisher.py:394)."""
        return np.diag(self.covariance(params if isinstance(params, (list, tuple)) or params is None
                                       else [params]))

    def corrcoef(self, params=None):
        """Correlation matrix (reference fisher.py:390)."""
        from .utils import cov_to_corrcoef
        return cov_to_corrcoef(self.covariance(params))

    def clone(self, center=None, params=None, gradient=None, offset=None, hessian=None):
        """Copy with overrides (reference fisher.py:168)."""
        return LikelihoodFisher(self.center if center is None else center,
                                self.params if params is None else params,
                                self.hessian if hessian is None else hessian,
                                gradient=self.gradient if gradient is None else gradient,
                                offset=self.offset if offset is None else offset)

    def deepcopy(self):
        import copy
        return copy.deepcopy(self)

    def shift(self, mean):
        """Move the likelihood mean to ``mean`` by adjusting the gradient
        (reference fisher.py:447)."""
        gradient = self.hessian.dot(self.center - np.asarray(mean, dtype='f8'))
        return self.clone(gradient=gradient)

    def view(self, params=None):
        """Restrict to ``params`` (conditioned precision submatrix); unknown
        params enter with zero precision and gradient (reference fisher.py:412)."""
        if params is None:
            return self.deepcopy()
        names = [getattr(p, 'name', p) for p in params]
        n = len(names)
        H = np.zeros((n, n))
        g = np.zeros(n)
        center = np.full(n, np.nan)
        known = [(i, self._names.index(nm)) for i, nm in enumerate(names) if nm in self._names]
        if known:
            inew = [i for i, _ in known]
            iold = [j for _, j in known]
            H[np.ix_(inew, inew)] = self.hessian[np.ix_(iold, iold)]
            g[inew] = self.gradient[iold]
            center[inew] = self.center[iold]
        plist = [self.params[nm] if nm in self._names else nm for nm in names]
        return LikelihoodFisher(np.nan_to_num(center), plist, H, gradient=g, offset=self.offset)

    def select(self, params=None, **kwargs):
        """Restrict to ``params`` (or a ParameterCollection.select query)
        (reference fisher.py:330)."""
        if params is None:
            params = self.params.select(**kwargs)
        return self.view(params=params)

    @classmethod
    def read_getdist(cls, base_fn):
        """Build from a getdist-format .covmat (reference fisher.py
        read_getdist): F = -H = C^-1 around a zero-filled center."""
        from .parameters import ParameterCovariance
        return ParameterCovariance.from_getdist(base_fn).to_fisher()

    def to_getdist(self, params=None, label=None):
        """Gaussian mixture in getdist form (reference fisher.py:567)."""
        from getdist.gaussian_mixtures import GaussianND
        names = self._names if params is None else [getattr(p, 'name', p) for p in params]
        return GaussianND(self.mean(params=list(names)), self.covariance(list(names)),
                          names=names, label=label)

    @classmethod
    def sum(cls, *others):
        """Combine independent Fisher information (union of parameters)."""
        if len(others) == 1 and isinstance(others[0], (list, tuple)):
            others = others[0]
        names = []
        for f in others:
            for n in f.names():
                if n not in names:
                    names.append(n)
        n = len(names)
        H = np.zeros((n, n))
        g = np.zeros(n)
        center = np.zeros(n)
        wsum = np.zeros(n)
        params = ParameterCollection()
        for f in others:
            idx = [names.index(nn) for nn in f.names()]
            H[np.ix_(idx, idx)] += f.hessian
            g[idx] += f.gradient
            center[idx] += f.center
            wsum[idx] += 1.
            for p in f.params:
                if p.name not in params:
                    params.set(p)
        center /= np.maximum(wsum, 1.)
        return cls(center, [params[nn] for nn in names], H, gradient=g)

    def __add__(self, other):
        return self.sum(self, other)

    def to_likelihood(self):
        """Export as a Gaussian compressed likelihood on the parameters."""
        from .likelihoods.base import FisherGaussianLikelihood
        return FisherGaussianLikelihood(fisher=self)

    def to_stats(self):
        lines = ['{:<24s} {:>14s} {:>14s}'.format('parameter', 'center', 'sigma')]
        for i, n in enumerate(self._names):
            lines.append('{:<24s} {:>14.6g} {:>14.6g}'.format(n, self.center[i], self.std(n)))
        return '\n'.join(lines)


class PriorFisher(BaseClass):
    """Analytic prior hessians for norm/uniform priors (reference fisher.py:702)."""

    @staticmethod
    def hessian(params, center):
        names = [p.name for p in params]
        H = np.zeros((len(names), len(names)))
        for i, p in enumerate(params):
            if p.prior is not None and p.prior.dist == 'norm':
                H[i, i] = -p.prior.scale ** -2
        return H


class Fisher(BaseClass):
    """Fisher forecast of a likelihood (reference fisher.py:642).

    For Gaussian likelihoods: F = J_w^T J_w with J_w the whitened design
    matrix from one jacfwd. For non-Gaussian: -hessian of the log-likelihood
    via jax.hessian.
    """

    def __init__(self, likelihood, method='auto', accuracy=2, delta_scale=1., mpicomm=None):
        """``method='finite'`` computes the design matrix / hessian by
        central finite differences through :class:`Differentiation` (for
        pipelines with non-differentiable host-eval nodes); ``accuracy`` and
        ``delta_scale`` configure that branch (reference fisher.py:642
        keywords). ``mpicomm`` is accepted and ignored — the FD grid is
        evaluated on device, not scattered over MPI ranks."""
        self.likelihood = likelihood
        self.pipeline = likelihood.pipeline
        self.varied_params = ParameterCollection(
            [p.clone() for p in self.pipeline.varied_params]
            + [p.clone(derived=False, fixed=False) for p in self.pipeline.solved_params])
        self.names = self.varied_params.names()
        self.method = method
        self.accuracy = int(accuracy)
        self.delta_scale = float(delta_scale)

    def run(self, **params):
        """Reference fisher.py name for one Fisher evaluation."""
        return self(**params)

    def __call__(self, **params):
        center = {p.name: p.value for p in self.varied_params}
        for name, v in params.items():
            matches = [p.name for p in self.varied_params if p.name == name or p.basename == name]
            if matches:
                center[matches[0]] = float(v)
        theta0 = jnp.asarray([center[n] for n in self.names])
        pipe = self.pipeline
        likelihoods = [like for like in self.likelihood.likelihoods]
        gaussian = all(hasattr(like, 'flatdata') for like in likelihoods)

        if gaussian:
            def flatdiffs(theta):
                values = dict(zip(self.names, theta))
                full = pipe._resolve_values(values)
                pipe.run_once(full)
                return jnp.concatenate([like.flatdiff_white for like in likelihoods])

            d = flatdiffs(theta0)
            if self.method == 'finite':
                J = self._fd_jacobian(flatdiffs, theta0)
            else:
                J = jax.jacfwd(flatdiffs)(theta0)        # (ndata, ndim)
            J = np.asarray(J, dtype='f8')
            H_like = -(J.T @ J)
            g_like = -(J.T @ np.asarray(d, dtype='f8'))
        else:
            def loglike(theta):
                values = dict(zip(self.names, theta))
                full = pipe._resolve_values(values)
                pipe.run_once(full)
                return sum(like.loglikelihood for like in likelihoods)

            if self.method == 'finite':
                g_like, H_like = self._fd_grad_hessian(loglike, theta0)
            else:
                H_like = np.asarray(jax.hessian(loglike)(theta0), dtype='f8')
                g_like = np.asarray(jax.grad(loglike)(theta0), dtype='f8')

        H_prior = PriorFisher.hessian(self.varied_params, theta0)
        H = H_like + H_prior
        return LikelihoodFisher(np.asarray(theta0), self.varied_params, H, gradient=g_like)

    def _fd_deltas(self, theta0):
        """Per-parameter central-difference steps: param.delta (or
        proposal / 10) scaled by ``delta_scale``, shrunk to keep every
        stencil point inside the prior limits (same clamping rule as
        Differentiation._clamped_deltas)."""
        reach = 2. if self.accuracy >= 4 else 1.
        deltas = np.empty(len(self.names))
        for i, p in enumerate(self.varied_params):
            delta = p.delta if np.ndim(p.delta) == 0 and p.delta else (p.proposal or 0.01) / 10.
            delta = float(delta) * self.delta_scale
            lims = p.prior.limits if p.prior is not None else (-np.inf, np.inf)
            center = float(theta0[i])
            room = min(center - lims[0] if np.isfinite(lims[0]) else np.inf,
                       lims[1] - center if np.isfinite(lims[1]) else np.inf)
            deltas[i] = min(delta, max(room, 0.) / reach * (1. - 1e-9)) if np.isfinite(room) else delta
        return deltas

    def _fd_jacobian(self, fn, theta0):
        """Central-difference Jacobian of a vector function (accuracy 2 or 4)."""
        theta0 = np.asarray(theta0, dtype='f8')
        deltas = self._fd_deltas(theta0)

        def at(i, mult):
            t = theta0.copy()
            t[i] += mult * deltas[i]
            return np.asarray(fn(jnp.asarray(t)), dtype='f8')

        cols = []
        for i in range(len(theta0)):
            if self.accuracy >= 4:
                col = (at(i, -2) - 8. * at(i, -1) + 8. * at(i, 1) - at(i, 2)) / (12. * deltas[i])
            else:
                col = (at(i, 1) - at(i, -1)) / (2. * deltas[i])
            cols.append(col)
        return np.stack(cols, axis=-1)

    def _fd_grad_hessian(self, fn, theta0):
        """Central-difference gradient and full hessian of a scalar function
        (diagonal: second-order stencil; off-diagonal: product stencil)."""
        theta0 = np.asarray(theta0, dtype='f8')
        deltas = self._fd_deltas(theta0)
        n = len(theta0)

        def at(offsets):
            t = theta0.copy()
            for i, mult in offsets:
                t[i] += mult * deltas[i]
            return float(fn(jnp.asarray(t)))

        f0 = at(())
        g = np.empty(n)
        H = np.empty((n, n))
        for i in range(n):
            fp, fm = at(((i, 1),)), at(((i, -1),))
            g[i] = (fp - fm) / (2. * deltas[i])
            H[i, i] = (fp - 2. * f0 + fm) / deltas[i] ** 2
            for j in range(i):
                H[i, j] = H[j, i] = (at(((i, 1), (j, 1))) - at(((i, 1), (j, -1)))
                                     - at(((i, -1), (j, 1))) + at(((i, -1), (j, -1)))) \
                    / (4. * deltas[i] * deltas[j])
        return g, H
