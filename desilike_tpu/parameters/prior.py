"""Prior / reference distributions as pure JAX-safe functions.

Counterpart of the reference's ``ParameterPrior`` (parameter.py:1905), which
wraps scipy distributions; here each distribution exposes jit/vmap-safe
``logpdf``, ``sample`` (counter-based jax.random) and host-side ``ppf``
(for nested-sampling prior transforms).
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from ..utils import BaseClass


class Prior(BaseClass):
    """Probability distribution with optional limits (truncation).

    Parameters
    ----------
    dist : str, default='uniform'
        Distribution name: 'uniform', 'norm', 'expon', 'loguniform'.
    limits : tuple, default=(-inf, inf)
        Lower/upper truncation limits. For 'uniform', these define the support.
    loc, scale : float
        Location / scale (for 'norm', 'expon').
    """

    def __init__(self, dist='uniform', limits=None, loc=0., scale=1., **kwargs):
        if 'lower' in kwargs or 'upper' in kwargs:
            limits = (kwargs.pop('lower', -np.inf), kwargs.pop('upper', np.inf))
        if kwargs:
            raise ValueError('unrecognized prior arguments {}'.format(kwargs))
        if limits is None:
            limits = (-np.inf, np.inf)
        self.dist = str(dist)
        self.limits = (float(limits[0]), float(limits[1]))
        if self.limits[0] >= self.limits[1]:
            raise ValueError('prior limits must be (lower, upper) with lower < upper, got {}'.format(limits))
        self.loc, self.scale = float(loc), float(scale)
        if self.dist == 'uniform' and np.isfinite(self.limits).all():
            self.loc = self.limits[0]
            self.scale = self.limits[1] - self.limits[0]
        self._setup()

    def _setup(self):
        lo, hi = self.limits
        if self.dist == 'uniform':
            if not np.isfinite([lo, hi]).all():
                self._lognorm = 0.  # improper flat prior
            else:
                self._lognorm = -np.log(hi - lo)
        elif self.dist == 'norm':
            # Truncation normalization
            a, b = (lo - self.loc) / self.scale, (hi - self.loc) / self.scale
            cdf = stats.norm.cdf(b) - stats.norm.cdf(a)
            self._lognorm = -0.5 * np.log(2 * np.pi) - np.log(self.scale) - np.log(cdf)
        elif self.dist == 'expon':
            self._lognorm = -np.log(self.scale)
        elif self.dist == 'loguniform':
            if not (lo > 0 and np.isfinite(hi)):
                raise ValueError('loguniform needs finite positive limits')
            self._lognorm = -np.log(np.log(hi / lo))
        else:
            raise ValueError('unknown distribution {}'.format(self.dist))

    # --- metadata ---

    @property
    def is_proper(self):
        """Whether the prior integrates to 1 (finite support or proper dist)."""
        return self.dist != 'uniform' or np.isfinite(self.limits).all()

    @property
    def is_limited(self):
        return np.isfinite(self.limits).any()

    def isin(self, x):
        return (x >= self.limits[0]) & (x <= self.limits[1])

    def affine_transform(self, loc=0., scale=1.):
        """Return prior for y = loc + scale * x (reference parameter.py affine_transform)."""
        limits = tuple(loc + scale * lim for lim in self.limits)
        if scale < 0:
            limits = limits[::-1]
        return Prior(dist=self.dist, limits=limits, loc=loc + scale * self.loc,
                     scale=abs(scale) * self.scale)

    # --- jit-safe evaluation ---

    def logpdf(self, x):
        """Log density at x; -inf outside limits. jit/vmap/grad-safe."""
        x = jnp.asarray(x)
        lo, hi = self.limits
        if self.dist == 'uniform':
            core = jnp.zeros_like(x) + self._lognorm
        elif self.dist == 'norm':
            core = -0.5 * ((x - self.loc) / self.scale) ** 2 + self._lognorm
        elif self.dist == 'expon':
            core = -(x - self.loc) / self.scale + self._lognorm
        elif self.dist == 'loguniform':
            core = -jnp.log(x) + self._lognorm
        inside = (x >= lo) & (x <= hi)
        return jnp.where(inside, core, -jnp.inf)

    def __call__(self, x):
        return self.logpdf(x)

    def sample(self, key, shape=()):
        """Draw samples with a jax.random key (counter-based, reproducible)."""
        lo, hi = self.limits
        if self.dist == 'uniform':
            if not np.isfinite([lo, hi]).all():
                raise ValueError('cannot sample improper uniform prior')
            return jax.random.uniform(key, shape, minval=lo, maxval=hi)
        if self.dist == 'norm':
            if np.isfinite([lo, hi]).any():
                a = (lo - self.loc) / self.scale
                b = (hi - self.loc) / self.scale
                return self.loc + self.scale * jax.random.truncated_normal(
                    key, max(a, -10.), min(b, 10.), shape)
            return self.loc + self.scale * jax.random.normal(key, shape)
        if self.dist == 'expon':
            return self.loc + self.scale * jax.random.exponential(key, shape)
        if self.dist == 'loguniform':
            u = jax.random.uniform(key, shape)
            return lo * (hi / lo) ** u
        raise ValueError(self.dist)

    def ppf_jax(self, u):
        """Percent-point function, jit/vmap-safe (nested-sampling prior
        transform runs on device inside the constrained-sampling kernel).
        Truncation constants are folded in host-side at build time."""
        from jax.scipy.special import ndtri
        u = jnp.asarray(u)
        lo, hi = self.limits
        if self.dist == 'uniform':
            if not np.isfinite([lo, hi]).all():
                raise ValueError('cannot prior-transform an improper uniform prior')
            return lo + (hi - lo) * u
        if self.dist == 'norm':
            a = stats.norm.cdf((lo - self.loc) / self.scale)
            b = stats.norm.cdf((hi - self.loc) / self.scale)
            up = a + (b - a) * u
            # clip away exact 0/1 so ndtri stays finite under float roundoff
            up = jnp.clip(up, 1e-15, 1. - 1e-15)
            return self.loc + self.scale * ndtri(up)
        if self.dist == 'expon':
            a = stats.expon.cdf(lo, loc=self.loc, scale=self.scale) if np.isfinite(lo) else 0.
            b = stats.expon.cdf(hi, loc=self.loc, scale=self.scale) if np.isfinite(hi) else 1.
            up = a + (b - a) * u
            return self.loc - self.scale * jnp.log1p(-jnp.clip(up, 0., 1. - 1e-15))
        if self.dist == 'loguniform':
            return lo * (hi / lo) ** u
        raise ValueError(self.dist)

    def ppf(self, u):
        """Percent-point function (host-side numpy; used by nested samplers)."""
        u = np.asarray(u)
        lo, hi = self.limits
        if self.dist == 'uniform':
            return lo + (hi - lo) * u
        if self.dist == 'norm':
            a, b = (lo - self.loc) / self.scale, (hi - self.loc) / self.scale
            return stats.truncnorm.ppf(u, a, b, loc=self.loc, scale=self.scale)
        if self.dist == 'expon':
            a = stats.expon.cdf(lo, loc=self.loc, scale=self.scale) if np.isfinite(lo) else 0.
            b = stats.expon.cdf(hi, loc=self.loc, scale=self.scale) if np.isfinite(hi) else 1.
            return stats.expon.ppf(a + (b - a) * u, loc=self.loc, scale=self.scale)
        if self.dist == 'loguniform':
            return lo * (hi / lo) ** u
        raise ValueError(self.dist)

    @property
    def std(self):
        """Standard deviation (used for default proposals / deltas)."""
        if self.dist == 'uniform':
            if np.isfinite(self.limits).all():
                return (self.limits[1] - self.limits[0]) / np.sqrt(12.)
            return np.inf
        if self.dist == 'norm':
            return self.scale
        if self.dist == 'expon':
            return self.scale
        if self.dist == 'loguniform':
            return float(stats.loguniform(*self.limits).std())
        raise ValueError(self.dist)

    @property
    def center(self):
        """A central value (loc, or middle of limits)."""
        if self.dist == 'norm' or self.dist == 'expon':
            return self.loc
        if np.isfinite(self.limits).all():
            if self.dist == 'loguniform':
                return float(np.sqrt(self.limits[0] * self.limits[1]))
            return 0.5 * (self.limits[0] + self.limits[1])
        return 0.

    def __repr__(self):
        if self.dist == 'uniform':
            return 'Prior(uniform, limits={})'.format(self.limits)
        base = 'Prior({}, loc={:g}, scale={:g}'.format(self.dist, self.loc, self.scale)
        if self.is_limited:
            base += ', limits={}'.format(self.limits)
        return base + ')'

    def __eq__(self, other):
        return (isinstance(other, Prior) and self.dist == other.dist
                and self.limits == other.limits and self.loc == other.loc
                and self.scale == other.scale)

    def __getstate__(self):
        return {'dist': self.dist, 'limits': self.limits, 'loc': self.loc, 'scale': self.scale}

    def __setstate__(self, state):
        self.__init__(**state)

    @classmethod
    def from_config(cls, config):
        """Build from a dict ({'dist': 'norm', 'loc': 0, ...}), tuple (limits) or Prior."""
        if isinstance(config, Prior):
            return config
        if config is None:
            return cls()
        if isinstance(config, (tuple, list)):
            return cls(limits=tuple(config))
        return cls(**dict(config))
