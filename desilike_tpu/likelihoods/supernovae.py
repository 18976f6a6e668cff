"""Type Ia supernova likelihoods: distance-modulus Gaussian likelihoods.

Counterpart of reference likelihoods/supernovae/ (Pantheon, PantheonPlus,
Union3, DES-Y5). The reference downloads data files via its Installer; in a
zero-egress build the classes take (z, magnitude, covariance) arrays or file
paths directly. The absolute-magnitude nuisance Mb is linear -> exactly
marginalizable ('.marg').
"""

import numpy as np
import jax.numpy as jnp

from ..theories.cosmology import Cosmology
from ..cosmology import background as bg
from .base import BaseGaussianLikelihood


class BaseSNLikelihood(BaseGaussianLikelihood):
    r"""mu(z) = 5 log10(D_L / 10pc) + M_b vs measured magnitudes.

    Parameters
    ----------
    z : array of redshifts
    magnitudes : array of (corrected) apparent magnitudes m_B
    covariance : (n, n) covariance (stat+sys)
    cosmo : optional shared Cosmology node
    """

    _static_linear_solved = ('Mb',)
    _params = dict(BaseGaussianLikelihood._params)
    _params.update({'Mb': dict(value=-19.2, prior=dict(limits=[-25., -15.]),
                               ref=dict(dist='norm', loc=-19.2, scale=0.05), latex='M_b')})

    def initialize(self, z=None, magnitudes=None, covariance=None, cosmo=None,
                   data_fn=None, cov_fn=None, **kwargs):
        if data_fn is not None:
            arr = np.loadtxt(str(data_fn))
            z, magnitudes = arr[:, 0], arr[:, 1]
        if cov_fn is not None:
            covariance = np.loadtxt(str(cov_fn))
            n = len(z)
            if covariance.ndim == 1:
                covariance = covariance[int(covariance[0] == n):].reshape(n, n)
        self.z = np.asarray(z, dtype='f8')
        self.cosmo = cosmo if cosmo is not None else Cosmology()
        super().initialize(data=np.asarray(magnitudes, dtype='f8'), covariance=covariance)

    def flattheory(self):
        p = self.cosmo.p
        dm = bg.comoving_angular_distance(p, jnp.asarray(self.z))   # Mpc/h
        dl_mpc = (1. + jnp.asarray(self.z)) * dm / p['h']
        mu = 5. * jnp.log10(dl_mpc) + 25.
        return mu + self._mb

    def calculate(self, Mb=-19.2, **kw):
        self._mb = jnp.asarray(Mb)
        super().calculate()


class PantheonLikelihood(BaseSNLikelihood):
    """Pantheon SN compilation (Scolnic et al. 2018); provide the data files
    via ``data_fn``/``cov_fn`` (reference downloads them through its
    Installer)."""


class PantheonPlusLikelihood(BaseSNLikelihood):
    """Pantheon+ (Brout et al. 2022); user-provided data files."""


class Union3Likelihood(BaseSNLikelihood):
    """Union3 (Rubin et al. 2023); user-provided data files."""


class DESY5SNLikelihood(BaseSNLikelihood):
    """DES 5-year SN sample (DES Collaboration 2024); user-provided files."""
