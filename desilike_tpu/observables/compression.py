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
                                   StandardPowerSpectrumExtractor,
                                   WiggleSplitPowerSpectrumExtractor,
                                   BandVelocityPowerSpectrumExtractor,
                                   TurnOverPowerSpectrumExtractor)
from ..interop import load_source


def _is_source(obj):
    """True for Chain/Profiles instances, paths, or sequences thereof."""
    from ..samples.chain import Chain
    from ..samples.profiles import Profiles
    if isinstance(obj, (Chain, Profiles)):
        return True
    if isinstance(obj, str) or hasattr(obj, '__fspath__'):
        return True
    if isinstance(obj, (list, tuple)) and obj:
        return _is_source(obj[0])
    return False


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

    @classmethod
    def _quantities_default(cls, init_kwargs):
        return list(cls._default_quantities)

    _default_quantities = ['DM_over_rd', 'DH_over_rd']

    def initialize(self, data=None, covariance=None, quantities=None, z=1.,
                   cosmo=None, fiducial=None, burnin=None, **kwargs):
        if quantities is None:
            quantities = self._quantities_default(kwargs)
        self.quantities = list(quantities)
        kw = dict(z=z, cosmo=cosmo, **kwargs)
        if fiducial is not None:
            kw['fiducial'] = fiducial
        self.extractor = self._extractor_cls(**kw)
        # chains/profiles/paths accepted directly (reference compression.py:54
        # via load_source): best-fit point for the data vector; if no explicit
        # covariance is given, the source's sample covariance is used
        if _is_source(data):
            source = data
            data = load_source(source, choice={'index': 'argmax'}, burnin=burnin,
                               params=self.quantities)
            if covariance is None:
                _, covariance = load_source(source, cov=True, burnin=burnin,
                                            params=self.quantities)
        if _is_source(covariance):
            _, covariance = load_source(covariance, cov=True, burnin=burnin,
                                        params=self.quantities)
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
    _default_quantities = ['DM_over_rd', 'DH_over_rd', 'df', 'dm']


class StandardCompressionObservable(BaseCompressionObservable):
    """Standard RSD compression: (DM/rd, DH/rd, df)."""

    _extractor_cls = StandardPowerSpectrumExtractor
    _default_quantities = ['DM_over_rd', 'DH_over_rd', 'df']


class WiggleSplitCompressionObservable(BaseCompressionObservable):
    """Wiggle-split compression: (qbao, qap, df, dm) (reference
    compression.py:263)."""

    _extractor_cls = WiggleSplitPowerSpectrumExtractor
    _default_quantities = ['qbao', 'qap', 'df', 'dm']


class BandVelocityCompressionObservable(BaseCompressionObservable):
    """Band velocity power compression: (dptt_i..., df, qap) (reference
    compression.py:305). Pass the band pivots as ``kp=``."""

    _extractor_cls = BandVelocityPowerSpectrumExtractor

    @classmethod
    def _quantities_default(cls, init_kwargs):
        kp = init_kwargs.get('kp', None)
        n = len(kp) if kp is not None else 0
        return ['dptt{:d}'.format(i) for i in range(n)] + ['df', 'qap']


class TurnOverCompressionObservable(BaseCompressionObservable):
    """Turn-over compression: (DV * kTO, DM/DH) (reference compression.py:346;
    arXiv:2302.07484)."""

    _extractor_cls = TurnOverPowerSpectrumExtractor
    _default_quantities = ['DV_times_kTO', 'DM_over_DH']


class P1DCompressionObservable(BaseCompressionObservable):
    """Lya P1D compression: (delta2_star, n_star) (reference
    observables/lya/compression.py:5)."""

    _default_quantities = ['delta2_star', 'n_star']

    @property
    def _extractor_cls(self):
        from ..theories.lya import P1DPowerSpectrumExtractor
        return P1DPowerSpectrumExtractor


class BAOPhaseShiftCompressionObservable(BaseCompressionObservable):
    """BAO + neutrino phase shift compression: (DM/rd, DH/rd, baoshift)
    (reference compression.py:131; arXiv:1803.10741)."""

    _default_quantities = ['DM_over_rd', 'DH_over_rd', 'baoshift']

    @property
    def _extractor_cls(self):
        from ..theories.extractors import BAOPhaseShiftExtractor
        return BAOPhaseShiftExtractor
