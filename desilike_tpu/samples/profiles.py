"""Profiles container: best fits, parabolic errors, intervals, 1D/2D profiles.

Counterpart of reference samples/profiles.py:508.
"""

import numpy as np

from ..utils import BaseClass
from ..parameters import ParameterCollection, Samples


class Profiles(BaseClass):
    """Holds profiling results.

    Attributes
    ----------
    bestfit : Samples
        Best-fit parameter values (+ 'logposterior'), one row per start.
    error : dict name -> float
        Parabolic errors from the inverse hessian.
    covariance : (ndim, ndim) array
    interval : dict name -> (lo, hi)
        Delta-chi2 = 1 likelihood intervals.
    profile : dict name -> (values, chi2)
        1D profile scans.
    contour : dict (name1, name2) -> {cl: (x, y)}
    """

    def __init__(self, params=None):
        self.params = ParameterCollection(params)
        self.bestfit = Samples()
        self.error = {}
        self.covariance = None
        self.interval = {}
        self.profile = {}
        self.contour = {}
        self.attrs = {}

    @property
    def start_size(self):
        return self.bestfit.shape[0] if self.bestfit.shape else 0

    def argmax(self):
        return int(np.argmax(np.asarray(self.bestfit['logposterior'])))

    def choice(self, index='argmax'):
        """Best single start as a dict name -> value."""
        i = self.argmax() if index == 'argmax' else int(index)
        return {name: float(np.asarray(self.bestfit[name])[i])
                for name in self.bestfit.names()}

    def to_stats(self):
        best = self.choice()
        lines = ['{:<24s} {:>14s} {:>14s} {:>26s}'.format('parameter', 'bestfit', 'error', 'interval')]
        for name in self.bestfit.names():
            if name == 'logposterior':
                continue
            err = self.error.get(name, float('nan'))
            iv = self.interval.get(name)
            ivs = '[{:.6g}, {:.6g}]'.format(*iv) if iv else '-'
            lines.append('{:<24s} {:>14.6g} {:>14.6g} {:>26s}'.format(name, best[name], err, ivs))
        lines.append('logposterior = {:.6g}'.format(best['logposterior']))
        return '\n'.join(lines)
