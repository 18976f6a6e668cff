"""Tracer correlation-function multipoles observable.

Counterpart of reference observables/galaxy_clustering/correlation_function.py
(mirror of the pk observable with s-space cuts).
"""

import numpy as np
import jax.numpy as jnp

from ..core import Calculator, Pipeline
from .window import WindowedCorrelationFunctionMultipoles


class TracerCorrelationFunctionMultipolesObservable(Calculator):
    """Observable: binned theory xi_l(s) vs flat data vector.

    Parameters
    ----------
    data : dict (generate from theory at these params), array, or None
    covariance : matrix, or list of mock vectors
    slim : dict ell -> (smin, smax, sstep)
    theory : correlation-function multipoles calculator
    """

    _state_attrs = ['flattheory']

    def initialize(self, data=None, covariance=None, slim=None, s=None, ells=None, theory=None,
                   fiber_collisions=None, systematic_templates=None):
        from .types import ObservableArray, ObservableCovariance
        self._nobs_input = None
        if isinstance(covariance, ObservableCovariance):
            self._nobs_input = covariance.nobs
            covariance = covariance.value
        if isinstance(data, ObservableArray):
            s, ells, slim = list(data.x), tuple(data.projs), None
            data = data.flatvalue
        self.wmatrix = WindowedCorrelationFunctionMultipoles(
            slim=slim, s=s, ells=ells, theory=theory,
            fiber_collisions=fiber_collisions, systematic_templates=systematic_templates)
        self.wmatrix.runtime_info.initialize()
        self.mocks = None
        self._covariance_input = None
        if isinstance(covariance, (list, tuple)) and len(covariance) and np.ndim(covariance[0]) >= 1:
            self.mocks = [np.ravel(np.asarray(m, dtype='f8')) for m in covariance]
            self._covariance_input = np.cov(np.array(self.mocks), rowvar=False, ddof=1)
        elif covariance is not None:
            self._covariance_input = np.atleast_2d(np.asarray(covariance, dtype='f8'))
        self._load_data(data)

    def _load_data(self, data):
        if data is None:
            self.flatdata = None
            return
        if isinstance(data, dict):
            pipe = Pipeline(self.wmatrix)
            pipe.evaluate(data)
            self.flatdata = np.asarray(pipe.root.flatcorr, dtype='f8')
            return
        self.flatdata = np.asarray(data, dtype='f8').ravel()

    @property
    def s(self):
        return self.wmatrix.s

    @property
    def sedges(self):
        return self.wmatrix.sedges

    @property
    def ells(self):
        return self.wmatrix.ells

    @property
    def covariance(self):
        return self._covariance_input

    @property
    def nmocks(self):
        if self.mocks is not None:
            return len(self.mocks)
        return self._nobs_input or 0

    def to_array(self):
        """Data vector as an ObservableArray (projections = multipoles)."""
        from .types import ObservableArray
        out, start = [], 0
        flat = self.flatdata
        for ss in self.s:
            out.append(flat[start:start + len(ss)] if flat is not None else None)
            start += len(ss)
        return ObservableArray(x=self.s, value=out if flat is not None else None,
                               projs=list(self.ells), name='correlation')

    def calculate(self, **params):
        self.flattheory = self.wmatrix.flatcorr

    @property
    def flatdiff(self):
        return self.flattheory - jnp.asarray(self.flatdata)

    @property
    def data(self):
        out, start = [], 0
        for ss in self.s:
            out.append(self.flatdata[start:start + len(ss)])
            start += len(ss)
        return out

    def get(self):
        return self.flattheory

    def plot(self, fn=None, show=False):
        from matplotlib import pyplot as plt
        fig, lax = plt.subplots(2, sharex=True, figsize=(6, 6), gridspec_kw={'height_ratios': [3, 1]})
        flattheory = np.asarray(self.flattheory)
        start = 0
        for ill, ss in enumerate(self.s):
            th = flattheory[start:start + len(ss)]
            color = 'C{:d}'.format(ill)
            lax[0].plot(ss, ss ** 2 * th, color=color, label=r'$\ell={:d}$'.format(self.ells[ill]))
            if self.flatdata is not None:
                dat = self.data[ill]
                std = None
                if self._covariance_input is not None:
                    std = np.sqrt(np.diag(self._covariance_input))[start:start + len(ss)]
                if std is not None:
                    lax[0].errorbar(ss, ss ** 2 * dat, ss ** 2 * std, color=color, linestyle='none', marker='.')
                    lax[1].plot(ss, (dat - th) / std, color=color)
            start += len(ss)
        lax[0].legend()
        lax[0].set_ylabel(r'$s^2 \xi_\ell(s)$')
        lax[1].set_xlabel(r'$s$ [$\mathrm{Mpc}/h$]')
        if fn:
            fig.savefig(fn, bbox_inches='tight')
        if show:
            plt.show()
        return fig
