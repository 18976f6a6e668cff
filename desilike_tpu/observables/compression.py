"""Compression observables: Gaussian likelihoods on compressed parameters.

Counterpart of reference observables/galaxy_clustering/compression.py: the
data vector is a set of compressed measurements (DH/rd, DM/rd, df, dm, ...)
from a BAO/ShapeFit fit; the theory is the corresponding extractor run on
the current cosmology.
"""

import numpy as np
import jax.numpy as jnp

from ..core import Calculator
from ..theories.extractors import (BAOExtractor, ShapeFitPowerSpectrumExtractor,
                                   StandardPowerSpectrumExtractor)


class BaseCompressionObservable(Calculator):
    """Gaussian observable on compressed quantities (reference compression.py:23).

    Parameters
    ----------
    data : dict name -> value, or array matching ``quantities``
    covariance : matrix
    quantities : list of extractor attribute names, e.g.
        ['DM_over_rd', 'DH_over_rd']
    z : effective redshift
    cosmo : optional shared Cosmology node
    """

    _extractor_cls = BAOExtractor
    _state_attrs = ['flattheory']

    def initialize(self, data=None, covariance=None, quantities=None, z=1.,
                   cosmo=None, fiducial=None, **kwargs):
        if quantities is None:
            quantities = ['DM_over_rd', 'DH_over_rd']
        self.quantities = list(quantities)
        self.extractor = self._extractor_cls(z=z, cosmo=cosmo, fiducial=fiducial, **kwargs)
        if isinstance(data, dict):
            data = [data[q] for q in self.quantities]
        self.flatdata = np.asarray(data, dtype='f8').ravel()
        if covariance is None:
            raise ValueError('provide covariance for compression observable')
        self._covariance_input = np.atleast_2d(np.asarray(covariance, dtype='f8'))
        if self._covariance_input.shape[0] == 1 and len(self.flatdata) > 1:
            self._covariance_input = np.diag(np.asarray(covariance, dtype='f8') ** 2)

    @property
    def covariance(self):
        return self._covariance_input

    @property
    def nmocks(self):
        return 0

    def calculate(self, **params):
        self.flattheory = jnp.stack([jnp.asarray(getattr(self.extractor, q))
                                     for q in self.quantities])

    @property
    def flatdiff(self):
        return self.flattheory - jnp.asarray(self.flatdata)

    def get(self):
        return self.flattheory


class BAOCompressionObservable(BaseCompressionObservable):
    """BAO distance-ratio compression (reference compression.py:90)."""

    _extractor_cls = BAOExtractor


class ShapeFitCompressionObservable(BaseCompressionObservable):
    """ShapeFit compression: (DM/rd, DH/rd, df, dm) (reference compression.py)."""

    _extractor_cls = ShapeFitPowerSpectrumExtractor

    def initialize(self, quantities=None, **kwargs):
        if quantities is None:
            quantities = ['DM_over_rd', 'DH_over_rd', 'df', 'dm']
        super().initialize(quantities=quantities, **kwargs)


class StandardCompressionObservable(BaseCompressionObservable):
    """Standard RSD compression: (DM/rd, DH/rd, df)."""

    _extractor_cls = StandardPowerSpectrumExtractor

    def initialize(self, quantities=None, **kwargs):
        if quantities is None:
            quantities = ['DM_over_rd', 'DH_over_rd', 'df']
        super().initialize(quantities=quantities, **kwargs)
