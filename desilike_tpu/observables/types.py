"""Observable containers: projection-structured data vectors and covariances.

Counterpart of the reference's legacy ``ObservableArray`` /
``ObservableCovariance`` (observables/types.py:24,511): a flat value vector
organized by projections (e.g. multipoles) with per-projection coordinates,
supporting select/slice/rebin and matched covariance views.
"""

import numpy as np

from ..utils import BaseClass, is_sequence


class ObservableArray(BaseClass):
    """Projection-structured observable vector.

    Parameters
    ----------
    x : list of arrays
        Coordinates per projection (e.g. k per multipole).
    value : list of arrays
        Values per projection.
    projs : list
        Projection labels (e.g. ells (0, 2, 4)).
    edges : list of (n, 2) arrays, optional
    """

    def __init__(self, x=None, value=None, projs=None, edges=None, attrs=None):
        if projs is None:
            projs = list(range(len(x)))
        self.projs = list(projs)
        self.x = [np.asarray(xx, dtype='f8') for xx in x]
        self.value = [np.asarray(v, dtype='f8') for v in value] if value is not None \
            else [np.zeros(len(xx)) for xx in self.x]
        if edges is None:
            edges = []
            for xx in self.x:
                if len(xx) > 1:
                    mid = (xx[1:] + xx[:-1]) / 2.
                    e = np.concatenate([[xx[0] - (mid[0] - xx[0])], mid, [xx[-1] + (xx[-1] - mid[-1])]])
                else:
                    e = np.array([xx[0] * 0.9, xx[0] * 1.1])
                edges.append(np.column_stack([e[:-1], e[1:]]))
        self.edges = [np.asarray(e, dtype='f8') for e in edges]
        self.attrs = dict(attrs or {})

    @property
    def flatvalue(self):
        return np.concatenate(self.value)

    @property
    def size(self):
        return sum(len(v) for v in self.value)

    def index(self, proj):
        return self.projs.index(proj)

    def _proj_slices(self):
        out, start = {}, 0
        for proj, v in zip(self.projs, self.value):
            out[proj] = slice(start, start + len(v))
            start += len(v)
        return out

    def select(self, projs=None, xlim=None):
        """Sub-array restricted to given projections and/or x-range."""
        if projs is None:
            projs = self.projs
        if not is_sequence(projs):
            projs = [projs]
        idx = [self.index(p) for p in projs]
        masks = []
        for i in idx:
            m = np.ones(len(self.x[i]), dtype=bool)
            if xlim is not None:
                m &= (self.x[i] >= xlim[0]) & (self.x[i] <= xlim[1])
            masks.append(m)
        return ObservableArray(
            x=[self.x[i][m] for i, m in zip(idx, masks)],
            value=[self.value[i][m] for i, m in zip(idx, masks)],
            projs=[self.projs[i] for i in idx],
            edges=[self.edges[i][m] for i, m in zip(idx, masks)],
            attrs=self.attrs)

    def flat_mask(self, projs=None, xlim=None):
        """Boolean mask into the flat vector for a selection."""
        mask = np.zeros(self.size, dtype=bool)
        slices = self._proj_slices()
        projs_sel = self.projs if projs is None else (projs if is_sequence(projs) else [projs])
        for proj in projs_sel:
            i = self.index(proj)
            m = np.ones(len(self.x[i]), dtype=bool)
            if xlim is not None:
                m &= (self.x[i] >= xlim[0]) & (self.x[i] <= xlim[1])
            mask[slices[proj]] = m
        return mask

    def rebin(self, factor=2):
        """Average ``factor`` adjacent bins."""
        xs, vals, edges = [], [], []
        for xx, vv, ee in zip(self.x, self.value, self.edges):
            n = (len(xx) // factor) * factor
            xs.append(xx[:n].reshape(-1, factor).mean(axis=1))
            vals.append(vv[:n].reshape(-1, factor).mean(axis=1))
            edges.append(np.column_stack([ee[:n:factor, 0], ee[factor - 1:n:factor, 1]]))
        return ObservableArray(x=xs, value=vals, projs=self.projs, edges=edges, attrs=self.attrs)

    def __repr__(self):
        return 'ObservableArray(projs={}, sizes={})'.format(self.projs, [len(v) for v in self.value])


class ObservableCovariance(BaseClass):
    """Covariance matched to an ObservableArray layout."""

    def __init__(self, value, observables):
        self.value = np.atleast_2d(np.asarray(value, dtype='f8'))
        if not is_sequence(observables):
            observables = [observables]
        self.observables = list(observables)
        sizes = sum(o.size for o in self.observables)
        if self.value.shape != (sizes, sizes):
            raise ValueError('covariance shape {} != total observable size {}'.format(self.value.shape, sizes))

    def _full_mask(self, selections):
        masks = []
        for obs, sel in zip(self.observables, selections):
            masks.append(obs.flat_mask(**(sel or {})))
        return np.concatenate(masks)

    def select(self, projs=None, xlim=None):
        """Marginalized (row/column dropped) covariance for a selection
        applied to every observable."""
        mask = self._full_mask([dict(projs=projs, xlim=xlim)] * len(self.observables))
        idx = np.flatnonzero(mask)
        new_obs = [o.select(projs=projs if projs is not None else None, xlim=xlim)
                   for o in self.observables]
        return ObservableCovariance(self.value[np.ix_(idx, idx)], new_obs)

    def corrcoef(self):
        d = np.sqrt(np.diag(self.value))
        return self.value / np.outer(d, d)

    def inv(self):
        return np.linalg.inv(self.value)

    @property
    def std(self):
        return np.sqrt(np.diag(self.value))

    def __repr__(self):
        return 'ObservableCovariance(shape={})'.format(self.value.shape)
