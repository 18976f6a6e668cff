"""Tracer bispectrum multipoles observable.

Counterpart of reference observables/galaxy_clustering/bispectrum.py:16:
triangle-binned data vector vs the tree-level bispectrum theory.
"""

import numpy as np
import jax.numpy as jnp

from ..core import Calculator, Pipeline
from ..theories.bispectrum import TreeLevelBispectrumMultipoles


class TracerBispectrumMultipolesObservable(Calculator):
    """Observable: theory B_l(k1,k2,k3) on given triangles vs flat data."""

    _state_attrs = ['flattheory']

    def initialize(self, data=None, covariance=None, triangles=None, ells=(0,), theory=None):
        if theory is None:
            theory = TreeLevelBispectrumMultipoles(triangles=triangles, ells=ells)
        elif triangles is not None:
            theory.init.update(triangles=triangles, ells=ells)
        self.theory = theory
        self.theory.runtime_info.initialize()
        self.triangles = self.theory.triangles
        self.ells = tuple(self.theory.ells)
        self.mocks = None
        self._covariance_input = None
        if isinstance(covariance, (list, tuple)) and len(covariance) and np.ndim(covariance[0]) >= 1:
            self.mocks = [np.ravel(np.asarray(m, dtype='f8')) for m in covariance]
            self._covariance_input = np.cov(np.array(self.mocks), rowvar=False, ddof=1)
        elif covariance is not None:
            self._covariance_input = np.atleast_2d(np.asarray(covariance, dtype='f8'))
        if isinstance(data, dict):
            pipe = Pipeline(self.theory)
            pipe.evaluate(data)
            self.flatdata = np.asarray(self.theory.bispectrum, dtype='f8').ravel()
        elif data is not None:
            self.flatdata = np.asarray(data, dtype='f8').ravel()
        else:
            self.flatdata = None

    @property
    def covariance(self):
        return self._covariance_input

    @property
    def nmocks(self):
        return len(self.mocks) if self.mocks is not None else 0

    def calculate(self, **params):
        self.flattheory = self.theory.bispectrum.reshape(-1)

    @property
    def flatdiff(self):
        return self.flattheory - jnp.asarray(self.flatdata)

    def get(self):
        return self.flattheory
