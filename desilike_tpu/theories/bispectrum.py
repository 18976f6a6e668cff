"""Tree-level redshift-space galaxy bispectrum multipoles.

Counterpart of the reference's GeoFPT-AX wrapper (full_shape.py:2523): here
the tree-level bispectrum is computed in-framework from the Scoccimarro RSD
kernels Z1/Z2 with quadratic biasing, orientation-averaged on static
Gauss-Legendre (theta, phi) grids — pure fused tensor math, differentiable.
"""

import numpy as np
import jax.numpy as jnp

from ..core import Calculator
from .power_template import ShapeFitPowerSpectrumTemplate


class TreeLevelBispectrumMultipoles(Calculator):
    r"""B_0 (and optionally B_2) for a list of triangles (k1, k2, k3).

    B(k1, k2, k3; orientation) = 2 Z2(k1,k2) Z1(k1) Z1(k2) P(k1) P(k2) + cyc.
    with Z1 = b1 + f mu^2, Z2 the second-order RSD kernel with b2/bs2.
    Multipoles from averaging Legendre(mu1) over orientations.
    """

    _state_attrs = ['bispectrum']

    _params = {
        'b1': dict(value=2., prior=dict(limits=[0., 4.]), ref=dict(dist='norm', loc=2., scale=0.1), latex='b_1'),
        'b2': dict(value=0., prior=dict(dist='norm', loc=0., scale=5.), latex='b_2'),
        'bs2': dict(value=0., prior=dict(dist='norm', loc=0., scale=5.), latex='b_{s2}'),
        'snB': dict(value=0., prior=dict(dist='norm', loc=0., scale=5.), latex='s_{n,B}'),
    }

    def initialize(self, triangles=None, ells=(0,), template=None, ntheta=8, nphi=8,
                   shotnoise=1e4):
        if triangles is None:
            k = np.linspace(0.02, 0.12, 6)
            triangles = [(k1, k1, k1) for k1 in k]  # equilateral by default
        self.triangles = np.asarray(triangles, dtype='f8')  # (ntri, 3)
        self.ells = tuple(ells)
        if template is None:
            template = ShapeFitPowerSpectrumTemplate()
        self.template = template
        kin = np.geomspace(1e-4, 1., 600)
        self.template.init.update(k=kin)
        self.nd = 1. / float(shotnoise)
        # orientation grids
        xg, wx = np.polynomial.legendre.leggauss(ntheta)
        self.ct = xg                       # cos(theta) of k1 w.r.t. line of sight
        self.wt = wx / 2.
        phi = (np.arange(nphi) + 0.5) * 2. * np.pi / nphi
        self.phi = phi
        self.wphi = np.full(nphi, 1. / nphi)
        # triangle internal angles from closure: k3 = -(k1+k2)
        k1, k2, k3 = self.triangles.T
        self.mu12 = (k3 ** 2 - k1 ** 2 - k2 ** 2) / (2. * k1 * k2)  # cos(k1,k2)

    @staticmethod
    def _F2(k1, k2, mu):
        return 5. / 7. + (mu / 2.) * (k1 / k2 + k2 / k1) + (2. / 7.) * mu ** 2

    @staticmethod
    def _G2(k1, k2, mu):
        return 3. / 7. + (mu / 2.) * (k1 / k2 + k2 / k1) + (4. / 7.) * mu ** 2

    def _Z2(self, k1, k2, mu12, mu1, mu2, f, b1, b2, bs2):
        k12mu = k1 * mu1 + k2 * mu2              # (k1+k2) . zhat
        F2 = self._F2(k1, k2, mu12)
        G2 = self._G2(k1, k2, mu12)
        S2 = mu12 ** 2 - 1. / 3.
        # mu_12 along LOS for the pair: (k1 mu1 + k2 mu2)/|k1+k2|
        k12 = jnp.sqrt(jnp.clip(k1 ** 2 + k2 ** 2 + 2. * k1 * k2 * mu12, 1e-30, None))
        mu12_los = k12mu / k12
        Z2 = (b1 * F2 + f * mu12_los ** 2 * G2
              + f * k12mu / 2. * (mu1 / k1 * (b1 + f * mu2 ** 2) + mu2 / k2 * (b1 + f * mu1 ** 2))
              + b2 / 2. + bs2 / 2. * S2)
        return Z2

    def calculate(self, b1=2., b2=0., bs2=0., snB=0., **kw):
        f = self.template.f
        k1, k2, k3 = [jnp.asarray(v) for v in self.triangles.T]  # (ntri,)
        mu12 = jnp.asarray(self.mu12)
        pk = {i: self.template.pk_dd_interp(k) for i, k in enumerate((k1, k2, k3))}

        ct = jnp.asarray(self.ct)[:, None]          # (nt, 1)
        st = jnp.sqrt(jnp.clip(1. - ct ** 2, 0., None))
        cphi = jnp.cos(jnp.asarray(self.phi))[None, :]  # (1, np)
        # orientation: mu1 = ct; mu2 = ct*mu12 + st*sqrt(1-mu12^2)*cphi
        mu12_b = mu12[:, None, None]
        s12 = jnp.sqrt(jnp.clip(1. - mu12_b ** 2, 0., None))
        mu1 = jnp.broadcast_to(ct[None], (len(self.triangles), len(self.ct), len(self.phi)))
        mu2 = mu12_b * ct[None] + s12 * st[None] * cphi[None]
        # k3 direction from closure: k3 mu3 = -(k1 mu1 + k2 mu2)
        mu3 = -(k1[:, None, None] * mu1 + k2[:, None, None] * mu2) / k3[:, None, None]

        def Z1(mu):
            return b1 + f * mu ** 2

        def term(ka, kb, mua, mub, muab, pa, pb):
            Z2 = self._Z2(ka[:, None, None], kb[:, None, None], muab if muab.ndim == 3 else muab[:, None, None],
                          mua, mub, f, b1, b2, bs2)
            return 2. * Z2 * Z1(mua) * Z1(mub) * pa[:, None, None] * pb[:, None, None]

        # internal cosines for the other pairs from closure
        mu13 = (k2 ** 2 - k1 ** 2 - k3 ** 2) / (2. * k1 * k3)
        mu23 = (k1 ** 2 - k2 ** 2 - k3 ** 2) / (2. * k2 * k3)
        B = term(k1, k2, mu1, mu2, mu12[:, None, None], pk[0], pk[1]) \
            + term(k1, k3, mu1, mu3, jnp.asarray(mu13)[:, None, None], pk[0], pk[2]) \
            + term(k2, k3, mu2, mu3, jnp.asarray(mu23)[:, None, None], pk[1], pk[2])
        # shot-noise term: snB * (P1 + P2 + P3)/nd + 1/nd^2 (amplitude-varied)
        B = B + snB / self.nd * (pk[0] + pk[1] + pk[2])[:, None, None]

        wt = jnp.asarray(self.wt)[None, :, None]
        wphi = jnp.asarray(self.wphi)[None, None, :]
        rows = []
        for ell in self.ells:
            if ell == 0:
                leg = 1.
            elif ell == 2:
                leg = 2.5 * (3. * mu1 ** 2 - 1.) / 1.
            else:
                raise ValueError('bispectrum ells restricted to (0, 2)')
            rows.append(jnp.sum(B * leg * wt * wphi, axis=(1, 2)))
        self.bispectrum = jnp.stack(rows)

    def get(self):
        return self.bispectrum
