"""Tracer power-spectrum multipoles observable.

Counterpart of reference observables/galaxy_clustering/power_spectrum.py:22.
Key fixture behavior preserved (power_spectrum.py:95-97): ``data={}`` (or a
dict of parameter values) generates the data vector from the theory itself —
self-calibrating tests need no external files.
"""

import numpy as np
import jax.numpy as jnp

from ..core import Calculator, Pipeline
from .window import WindowedPowerSpectrumMultipoles


class TracerPowerSpectrumMultipolesObservable(Calculator):
    """Observable: windowed theory P_l(k) vs flat data vector.

    Parameters
    ----------
    data : dict, array, list of arrays, None
        dict -> generate data from theory at these parameter values;
        array (nell, nk) or flat -> measured multipoles;
        None -> zeros (for Fisher-style forecasts the covariance matters only).
    covariance : array or list of arrays (mocks), optional
        Covariance matrix, or a list of mock data vectors (np.cov + Hartlap
        handled by the likelihood).
    klim : dict ell -> (kmin, kmax, kstep)
    wmatrix, kinlim, shotnoise : see WindowedPowerSpectrumMultipoles
    theory : theory multipoles calculator
    """

    _state_attrs = ['flattheory']

    @staticmethod
    def _is_external(obj):
        """Measured-data formats: paths (incl. glob patterns), pypower-style
        objects, state dicts (see interop.read_power_multipoles)."""
        from ..interop import is_path
        if is_path(obj):
            return True
        if isinstance(obj, dict):
            return 'power' in obj or 'power_nonorm' in obj
        return (not isinstance(obj, (int, float, np.ndarray))
                and hasattr(obj, 'power') and hasattr(obj, 'ells'))

    def initialize(self, data=None, covariance=None, klim=None, k=None, ells=None,
                   wmatrix=None, kinlim=None, kin=None, kinrebin=None, ellsin=None,
                   shotnoise=None, theory=None, fiber_collisions=None, systematic_templates=None,
                   transform=None):
        if transform not in (None, 'cubic'):
            raise ValueError("transform must be None or 'cubic' (got {!r})".format(transform))
        self.transform = transform
        from ..interop import load_power_spectrum_data
        from ..utils import is_sequence
        from .types import ObservableArray, ObservableCovariance

        self._nobs_input = None
        if isinstance(covariance, ObservableCovariance):
            self._nobs_input = covariance.nobs
            covariance = covariance.value
        if isinstance(data, ObservableArray):
            k, ells, klim = list(data.x), tuple(data.projs), None
            data = data.flatvalue

        loaded_data = loaded_mocks = None
        klim_select = klim  # the selection applied to every external input
        if data is not None and (self._is_external(data) or
                                 (is_sequence(data) and len(data) and self._is_external(data[0]))):
            loaded_data = load_power_spectrum_data(data, klim=klim_select)
            k, ells, klim = loaded_data['k'], loaded_data['ells'], None
            if shotnoise is None:
                shotnoise = loaded_data['shotnoise']
        if covariance is not None and is_sequence(covariance) and len(covariance) \
                and self._is_external(covariance[0]):
            loaded_mocks = load_power_spectrum_data(list(covariance), klim=klim_select)
            if loaded_data is None:
                k, ells, klim = loaded_mocks['k'], loaded_mocks['ells'], None
            if shotnoise is None:
                shotnoise = loaded_mocks['shotnoise']
            covariance = loaded_mocks['list_y']

        self.wmatrix = WindowedPowerSpectrumMultipoles(
            klim=klim, k=k, ells=ells, wmatrix=wmatrix, kinlim=kinlim,
            kin=kin, kinrebin=kinrebin, ellsin=ellsin,
            shotnoise=float(shotnoise or 0.), theory=theory,
            fiber_collisions=fiber_collisions, systematic_templates=systematic_templates)
        self.wmatrix.runtime_info.initialize()
        self.mocks = None
        self._covariance_input = None
        if isinstance(covariance, (list, tuple)) and len(covariance) and np.ndim(covariance[0]) >= 1 \
                and not isinstance(covariance[0], (int, float)):
            self.mocks = [np.ravel(np.asarray(m, dtype='f8')) for m in covariance]
            self._covariance_input = np.cov(np.array(self.mocks), rowvar=False, ddof=1)
        elif covariance is not None:
            self._covariance_input = np.atleast_2d(np.asarray(covariance, dtype='f8'))
        self._load_data(loaded_data['flatdata'] if loaded_data is not None else data)

    def _load_data(self, data):
        if data is None:
            self.flatdata = None
            return
        if isinstance(data, dict):
            # self-generated mock: evaluate own sub-pipeline at given params
            pipe = Pipeline(self.wmatrix)
            pipe.evaluate(data)
            self.flatdata = np.asarray(pipe.root.flatpower, dtype='f8')
            return
        data = np.asarray(data, dtype='f8')
        self.flatdata = data.ravel()
        nexp = sum(len(kk) for kk in self.wmatrix.k)
        if self.flatdata.size != nexp:
            raise ValueError('data size {} != expected {}'.format(self.flatdata.size, nexp))

    @property
    def k(self):
        return self.wmatrix.k

    @property
    def kedges(self):
        return self.wmatrix.kedges

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
        value = self.data if self.flatdata is not None else None
        return ObservableArray(x=self.k, value=value, projs=list(self.ells),
                               name=getattr(self, 'name', '') or 'power')

    @property
    def footprint(self):
        raise AttributeError('no footprint attached; pass footprints to ObservablesCovarianceMatrix')

    def calculate(self, **params):
        self.flattheory = self.wmatrix.flatpower
        if self.transform == 'cubic':
            # Gaussianization of the pk likelihood (reference
            # power_spectrum.py:402; Wang et al. 2023, arXiv:2302.07484
            # eq. 16): compare 3 (T/D)^(1/3) - 2 in units of the data
            self.flattheory = (3. * (self.flattheory / jnp.asarray(self.flatdata))
                               ** (1. / 3.) - 2.) * jnp.asarray(self.flatdata)

    @property
    def flatdiff(self):
        return self.flattheory - jnp.asarray(self.flatdata)

    @property
    def data(self):
        """Data multipoles, list of (nk_ell,) arrays."""
        out, start = [], 0
        for kk in self.k:
            out.append(self.flatdata[start:start + len(kk)])
            start += len(kk)
        return out

    def get(self):
        return self.flattheory

    def plot(self, fn=None, show=False):
        """Plot data vs theory multipoles with residuals."""
        from matplotlib import pyplot as plt
        fig, lax = plt.subplots(2, sharex=True, figsize=(6, 6),
                                gridspec_kw={'height_ratios': [3, 1]})
        theory, start = [], 0
        flattheory = np.asarray(self.flattheory)
        for ill, kk in enumerate(self.k):
            th = flattheory[start:start + len(kk)]
            dat = self.data[ill] if self.flatdata is not None else None
            std = None
            if self._covariance_input is not None:
                std = np.sqrt(np.diag(self._covariance_input))[start:start + len(kk)]
            color = 'C{:d}'.format(ill)
            lax[0].plot(kk, kk * th, color=color, label=r'$\ell={:d}$'.format(self.ells[ill]))
            if dat is not None:
                if std is not None:
                    lax[0].errorbar(kk, kk * dat, kk * std, color=color, linestyle='none', marker='.')
                    lax[1].plot(kk, (dat - th) / std, color=color)
                else:
                    lax[0].plot(kk, kk * dat, color=color, linestyle='none', marker='.')
            start += len(kk)
        lax[0].legend()
        lax[0].set_ylabel(r'$k P_\ell(k)$ [$(\mathrm{Mpc}/h)^2$]')
        lax[1].set_xlabel(r'$k$ [$h/\mathrm{Mpc}$]')
        lax[1].set_ylabel(r'$\Delta P_\ell / \sigma$')
        if fn:
            fig.savefig(fn, bbox_inches='tight')
        if show:
            plt.show()
        return fig
