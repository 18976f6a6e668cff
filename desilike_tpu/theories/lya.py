"""Lyman-alpha forest: 1D flux power-spectrum shape extractor.

Counterpart of reference theories/lya/power_template.py:8
(P1DPowerSpectrumExtractor): extracts the amplitude Delta^2_* and slope n_*
of the linear power spectrum at the velocity-space pivot k_* [s/km] at the
effective redshift (z ~ 3), the standard compression of Ly-alpha P1D
constraints.
"""

import numpy as np
import jax.numpy as jnp

from ..core import Calculator
from ..cosmology import background as bg
from .cosmology import Cosmology


class P1DPowerSpectrumExtractor(Calculator):

    _params = {name: dict(derived=True) for name in ('delta2_star', 'n_star')}

    def initialize(self, z=3., kp_vel=0.009, cosmo=None):
        """kp_vel: pivot in s/km; conversion k [h/Mpc] = kp_vel * H(z)/(1+z) / h * ..."""
        self.z = float(z)
        self.kp_vel = float(kp_vel)
        self.cosmo = cosmo if cosmo is not None else Cosmology()

    def calculate(self, **params):
        p = self.cosmo.p
        # velocity -> comoving wavenumber: k [h/Mpc] = k_vel [s/km] * H(z)/(1+z) / (100 h) * 100
        # H(z) = 100 h E(z) km/s/Mpc -> k = k_vel * 100 E(z)/(1+z) [1/Mpc] / h... in h/Mpc:
        E = bg.efunc(p, self.z)
        kp = self.kp_vel * 100. * E / (1. + self.z)  # 1/Mpc
        kp = kp / p['h']                              # h/Mpc
        dk = 1e-2
        kk = kp * jnp.asarray([1. - dk, 1., 1. + dk])
        from ..cosmology import linear as lin
        pk = lin.pk_lin(p, kk, self.z)
        self.delta2_star = kk[1] ** 3 * pk[1] / (2. * np.pi ** 2)
        self.n_star = jnp.log(pk[2] / pk[0]) / jnp.log(kk[2] / kk[0])

    def get(self):
        return self
