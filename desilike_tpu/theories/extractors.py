"""Extractors: compressed parameters from a (varied) cosmology.

Counterpart of reference power_template.py extractor classes (BAOExtractor
:261, ShapeFitPowerSpectrumExtractor :602, StandardPowerSpectrumExtractor
:441): compute (qpar, qper, df, dm, ...) from base cosmological parameters,
for compression observables and template<->direct consistency.
Everything is differentiable through the EH98 backend.
"""

import numpy as np
import jax.numpy as jnp

from ..core import Calculator
from ..cosmology import background as bg
from ..cosmology import linear as lin
from ..cosmology import eh
from .cosmology import Cosmology


class BAOExtractor(Calculator):
    """BAO distance ratios from the cosmology (reference :261).

    Derived: DH_over_rd, DM_over_rd, DV_over_rd, DH_over_DM, and the
    q-parameters relative to the fiducial."""

    _params = {name: dict(derived=True) for name in
               ('DH_over_rd', 'DM_over_rd', 'DV_over_rd', 'DH_over_DM',
                'qpar', 'qper', 'qiso', 'qap')}

    def initialize(self, z=1., eta=1. / 3., cosmo=None, fiducial=None):
        self.z = float(np.asarray(z))
        self.eta = float(eta)
        fid = bg.resolve(fiducial if isinstance(fiducial, dict) else None)
        self.fiducial = fid
        self.cosmo = cosmo if cosmo is not None else Cosmology(fiducial=fiducial if isinstance(fiducial, dict) else None)
        DH = float(bg.hubble_distance(fid, self.z))
        DM = float(bg.comoving_angular_distance(fid, self.z))
        rd = float(bg.rs_drag(fid))
        self.DH_over_rd_fid = DH / rd
        self.DM_over_rd_fid = DM / rd
        self.DH_over_DM_fid = DH / DM
        self.DV_over_rd_fid = (DH ** self.eta * DM ** (1. - self.eta) * self.z ** (1. / 3.)) / rd

    def calculate(self, **params):
        DH = self.cosmo.hubble_distance(self.z)
        DM = self.cosmo.comoving_angular_distance(self.z)
        rd = self.cosmo.rs_drag()
        self.DH_over_rd = DH / rd
        self.DM_over_rd = DM / rd
        self.DH_over_DM = DH / DM
        self.DV_over_rd = (DH ** self.eta * DM ** (1. - self.eta) * self.z ** (1. / 3.)) / rd
        self.qpar = self.DH_over_rd / self.DH_over_rd_fid
        self.qper = self.DM_over_rd / self.DM_over_rd_fid
        self.qiso = self.DV_over_rd / self.DV_over_rd_fid
        self.qap = self.DH_over_DM / self.DH_over_DM_fid


class StandardPowerSpectrumExtractor(BAOExtractor):
    """(qpar, qper, df) with df = fsigma_r / fsigma_r_fid (reference :441)."""

    _params = dict(BAOExtractor._params)
    _params.update({'df': dict(derived=True), 'fsigmar': dict(derived=True)})

    def initialize(self, *args, r=8., **kwargs):
        self.r = float(r)
        super().initialize(*args, **kwargs)
        p = self.fiducial
        self.fsigmar_fid = float(bg.growth_rate(p, self.z)) * float(lin.sigma_r(p, self.r, self.z))

    def calculate(self, **params):
        super().calculate(**params)
        p = self.cosmo.p
        r = self.r * self.qiso
        self.fsigmar = bg.growth_rate(p, self.z) * lin.sigma_r(p, r, self.z)
        self.df = self.fsigmar / self.fsigmar_fid


class ShapeFitPowerSpectrumExtractor(BAOExtractor):
    r"""ShapeFit (dm, dn, df) extraction (reference :602; arXiv:2106.07641).

    m: slope of ln(pknow) at the (rd-scaled) pivot; df from f sqrt(Ap) with
    Ap the no-wiggle amplitude at the pivot.
    """

    _params = dict(BAOExtractor._params)
    _params.update({name: dict(derived=True) for name in ('dm', 'dn', 'df', 'm', 'n', 'f_sqrt_Ap')})

    def initialize(self, *args, kp=0.03, a=0.6, n_varied=False, **kwargs):
        self.kp = float(kp)
        self.a = float(a)
        self.n_varied = bool(n_varied)
        super().initialize(*args, **kwargs)
        p = self.fiducial
        self.rd_fid_mpc = float(bg.rs_drag(p))
        self.n_fid = float(p['n_s'])
        self.m_fid, self.Ap_fid, self.f_fid = [float(v) for v in self._shape_values(p, 1.)]
        self.f_sqrt_Ap_fid = self.f_fid * self.Ap_fid ** 0.5

    def _shape_values(self, p, s):
        """(m, Ap, f) at pivot kp/s, with s = rd/rd_fid."""
        kp = self.kp / s
        dk = 1e-2
        kk = kp * jnp.array([1. - dk, 1. + dk])
        pknow = lin.pk_lin(p, kk, self.z, nowiggle=True)
        prim = kk * lin.primordial_curvature(p, kk) if self.n_varied else jnp.ones(2)
        m = jnp.log(pknow[1] / prim[1] * prim[0] / pknow[0]) / jnp.log(kk[1] / kk[0])
        Ap = lin.pk_lin(p, jnp.asarray([kp]), self.z, nowiggle=True)[0] / s ** 3
        f = bg.growth_rate(p, self.z)
        return m, Ap, f

    def calculate(self, **params):
        super().calculate(**params)
        p = self.cosmo.p
        s = self.cosmo.rs_drag() / self.rd_fid_mpc
        self.m, Ap, f = self._shape_values(p, s)
        self.n = p['n_s']
        self.dm = self.m - self.m_fid
        self.dn = self.n - self.n_fid
        self.f_sqrt_Ap = f * Ap ** 0.5
        self.df = self.f_sqrt_Ap / self.f_sqrt_Ap_fid
