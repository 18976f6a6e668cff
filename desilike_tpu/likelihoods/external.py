"""External (non-clustering) likelihoods: BBN, local H0/Mb, CMB geometry.

Counterparts of reference likelihoods/bbn/bbn.py, hubble/, and a
CMB-distance-prior stand-in for the compressed Planck likelihoods
(reference cmb/planck2018_gaussian.py). Published measurement values are
from the cited papers.
"""

import numpy as np
import jax.numpy as jnp

from ..theories.cosmology import Cosmology, TNCDM_NEFF
from ..cosmology import background as bg
from .base import BaseGaussianLikelihood


class BaseBBNLikelihood(BaseGaussianLikelihood):
    """Gaussian likelihood on (omega_b, N_eff)-type quantities
    (reference bbn/bbn.py)."""

    quantities = ('omega_b', 'N_eff')
    mean = None
    covariance = None

    def initialize(self, mean=None, covariance=None, quantities=None, cosmo=None, **kwargs):
        mean = self.mean if mean is None else mean
        covariance = self.covariance if covariance is None else covariance
        self.quantities = list(quantities or self.quantities)
        self.cosmo = cosmo if cosmo is not None else Cosmology()
        super().initialize(data=np.asarray(mean, dtype='f8'),
                           covariance=np.asarray(covariance, dtype='f8'))

    def flattheory(self):
        values = []
        for q in self.quantities:
            if q == 'N_eff':
                values.append(self.cosmo.p['N_ur'] + self.cosmo.p.get('N_ncdm', 1) * TNCDM_NEFF)
            else:
                values.append(self.cosmo.p[q])
        return jnp.stack([jnp.asarray(v) for v in values])


class Schoneberg2024BBNLikelihood(BaseBBNLikelihood):
    """BBN (omega_b, N_eff) from Schoneberg 2024 (arXiv:2401.15054)."""

    mean = [0.02196, 2.904]
    covariance = [[4.03112260e-07, 7.30390042e-05],
                  [7.30390042e-05, 4.52831584e-02]]


class H0Likelihood(BaseGaussianLikelihood):
    """Gaussian likelihood on H0 = 100 h (reference hubble/base.py)."""

    mean = None
    std = None

    def initialize(self, mean=None, std=None, cosmo=None, **kwargs):
        mean = self.mean if mean is None else mean
        std = self.std if std is None else std
        self.cosmo = cosmo if cosmo is not None else Cosmology()
        super().initialize(data=[float(mean)], covariance=[[float(std) ** 2]])

    def flattheory(self):
        return jnp.stack([100. * self.cosmo.p['h']])


class Riess2020H0Likelihood(H0Likelihood):
    """Local H0 from Riess et al. 2020 (arXiv:2012.08534)."""

    mean = 73.2
    std = 1.3


class MbLikelihood(BaseGaussianLikelihood):
    """Gaussian likelihood on the SN absolute magnitude Mb."""

    mean = None
    std = None
    _params = dict(BaseGaussianLikelihood._params)
    _params.update({'Mb': dict(value=-19.263, prior=dict(limits=[-20., -18.]), latex='M_b')})

    def initialize(self, mean=None, std=None, **kwargs):
        mean = self.mean if mean is None else mean
        std = self.std if std is None else std
        super().initialize(data=[float(mean)], covariance=[[float(std) ** 2]])

    def flattheory(self):
        return jnp.stack([self._mb])

    def calculate(self, Mb=-19.263, **kw):
        self._mb = jnp.asarray(Mb)
        super().calculate()


class Riess2020MbLikelihood(MbLikelihood):
    mean = -19.263
    std = 0.049


class CMBDistancePriorLikelihood(BaseGaussianLikelihood):
    r"""CMB geometric compression: Gaussian on (R, l_A, omega_b)
    (shift parameter, acoustic scale), the standard distance-prior
    compression of the Planck 2018 likelihood (Chen, Huang & Wang 2019,
    arXiv:1808.05724: R = 1.7502 +- 0.0046, l_A = 301.471 +- 0.090,
    omega_b = 0.02236 +- 0.00015, with their correlation matrix).

    Theory: z* from the Hu & Sugiyama 1996 fit; D_M(z*) from the
    differentiable background; r_s(z*) from the sound-horizon integral
    with R_b(a) baryon loading.
    """

    mean = [1.7502, 301.471, 0.02236]
    std = [0.0046, 0.090, 0.00015]
    corr = [[1.0, 0.46, -0.66],
            [0.46, 1.0, -0.33],
            [-0.66, -0.33, 1.0]]

    def initialize(self, mean=None, covariance=None, cosmo=None, **kwargs):
        mean = self.mean if mean is None else mean
        if covariance is None:
            std = np.asarray(self.std)
            covariance = np.asarray(self.corr) * np.outer(std, std)
        self.cosmo = cosmo if cosmo is not None else Cosmology()
        super().initialize(data=np.asarray(mean, dtype='f8'),
                           covariance=np.asarray(covariance, dtype='f8'))

    @staticmethod
    def z_star(p):
        """Recombination redshift, Hu & Sugiyama 1996 fit (eq. E-1)."""
        ob = p['omega_b']
        om = bg.omega_m(p)
        g1 = 0.0783 * ob ** -0.238 / (1. + 39.5 * ob ** 0.763)
        g2 = 0.560 / (1. + 21.1 * ob ** 1.81)
        return 1048. * (1. + 0.00124 * ob ** -0.738) * (1. + g1 * om ** g2)

    @staticmethod
    def rs_z(p, z):
        """Comoving sound horizon at z, Mpc/h: int_z^inf cs dz / H."""
        # integrate in ln a from a_init to a(z)
        a_end = 1. / (1. + z)
        # start at a=1e-6: earlier times contribute negligibly and a^-5
        # factors in the backward pass stay float32-finite
        lna = jnp.linspace(jnp.log(1e-6), jnp.log(a_end), 512)
        a = jnp.exp(lna)
        Rb = 3. * p['omega_b'] / (4. * bg.omega_gamma(p)) * a
        cs = 1. / jnp.sqrt(3. * (1. + Rb))
        integrand = cs / (a * bg.efunc_of_a(p, a))  # dz = -da/a^2; d lna = da/a
        # int cs dz / E = int cs / (a E) dlna ... careful: dz/dlna = -1/a
        w = jnp.gradient(lna)
        return bg.DH_100 * jnp.sum(w * integrand)

    def flattheory(self):
        p = self.cosmo.p
        zs = self.z_star(p)
        dm = bg.comoving_angular_distance(p, zs)           # Mpc/h
        rs = self.rs_z(p, zs)                               # Mpc/h
        # R = sqrt(Omega_m) H0 D_M(z*) / c, dimensionless
        R = jnp.sqrt(bg.Omega_m(p)) * dm / bg.DH_100
        lA = jnp.pi * dm / rs
        return jnp.stack([R, lA, jnp.asarray(p['omega_b'])])
