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

    def to_stats(self, tablefmt='plain'):
        """Summary table; tablefmt 'plain' or 'latex' (reference
        profiles.py to_stats tablefmt option)."""
        best = self.choice()
        names = [n for n in self.bestfit.names() if n != 'logposterior']
        if tablefmt == 'latex':
            lines = [r'\begin{tabular}{lccc}',
                     r'parameter & bestfit & error & interval \\ \hline']
            for name in names:
                p = self.params[name] if name in self.params else None
                latex = '$' + p.latex + '$' if p is not None and p.latex else name
                err = self.error.get(name, float('nan'))
                iv = self.interval.get(name)
                ivs = '$[{:.4g}, {:.4g}]$'.format(*iv) if iv else '-'
                lines.append(r'{} & ${:.6g}$ & ${:.4g}$ & {} \\'.format(latex, best[name], err, ivs))
            lines.append(r'\end{tabular}')
            return '\n'.join(lines)
        lines = ['{:<24s} {:>14s} {:>14s} {:>26s}'.format('parameter', 'bestfit', 'error', 'interval')]
        for name in names:
            err = self.error.get(name, float('nan'))
            iv = self.interval.get(name)
            ivs = '[{:.6g}, {:.6g}]'.format(*iv) if iv else '-'
            lines.append('{:<24s} {:>14.6g} {:>14.6g} {:>26s}'.format(name, best[name], err, ivs))
        lines.append('logposterior = {:.6g}'.format(best['logposterior']))
        return '\n'.join(lines)

    # --- IO (npz state, same conventions as Samples.save) ---

    def save(self, filename):
        import json
        arrays = {'bestfit:' + name: np.asarray(self.bestfit[name]) for name in self.bestfit.names()}
        for name, (x, chi2) in self.profile.items():
            arrays['profile:' + name] = np.stack([np.asarray(x), np.asarray(chi2)])
        for (n1, n2), levels in self.contour.items():
            for cl, (x, y) in levels.items():
                arrays['contour:{}:{}:{}'.format(n1, n2, cl)] = np.stack([np.asarray(x), np.asarray(y)])
        if self.covariance is not None:
            arrays['covariance'] = np.asarray(self.covariance)
        meta = {'params': self.params.__getstate__(),
                'error': {k: float(v) for k, v in self.error.items()},
                'interval': {k: [float(v[0]), float(v[1])] for k, v in self.interval.items()},
                'attrs': {k: v for k, v in self.attrs.items() if isinstance(v, (int, float, str, bool, list, tuple))}}
        arrays['__meta__'] = np.array(json.dumps(meta, default=float))
        np.savez(str(filename), **arrays)

    @classmethod
    def load(cls, filename):
        import json
        from ..parameters import Parameter
        loaded = np.load(str(filename), allow_pickle=False)
        meta = json.loads(str(loaded['__meta__']))
        new = cls([Parameter(**s) for s in meta['params']['params']])
        new.error = dict(meta.get('error', {}))
        new.interval = {k: tuple(v) for k, v in meta.get('interval', {}).items()}
        new.attrs = meta.get('attrs', {})
        for key in loaded.files:
            if key.startswith('bestfit:'):
                new.bestfit[key[8:]] = loaded[key]
            elif key.startswith('profile:'):
                new.profile[key[8:]] = (loaded[key][0], loaded[key][1])
            elif key.startswith('contour:'):
                _, n1, n2, cl = key.split(':')
                new.contour.setdefault((n1, n2), {})[float(cl)] = (loaded[key][0], loaded[key][1])
            elif key == 'covariance':
                new.covariance = loaded[key]
        return new
