"""Base theory classes: multipole grids, mu-wedge projection, AP effect,
and pk -> xi via FFTLog.

Counterpart of reference theories/galaxy_clustering/base.py.
"""

import numpy as np
import jax.numpy as jnp

from ..core import Calculator
from ..ops.legendre import weights_mu, multipole_weights, to_poles
from ..ops.fftlog import PowerToCorrelation
from ..ops.interp import interp1d
from .cosmology import Cosmology


def ap_k_mu(k, mu, qpar=1., qper=1.):
    """Alcock-Paczynski remap of (k, mu), Beutler 2016 eqs. 44-45
    (reference base.py:211-223). k: (nk,), mu: (nmu,) -> (jac, kap (nk, nmu), muap (nmu,))."""
    qap = qpar / qper
    jac = 1. / (qpar * qper ** 2)
    factorap = jnp.sqrt(1. + mu ** 2 * (1. / qap ** 2 - 1.))
    kap = k[:, None] / qper * factorap
    muap = mu / qap / factorap
    return jac, kap, muap


def ap_s_mu(s, mu, qpar=1., qper=1.):
    """AP remap in configuration space (qpar -> 1/qpar etc., reference base.py:226-236)."""
    qap = qpar / qper
    factorap = jnp.sqrt(1. + mu ** 2 * (qap ** 2 - 1.))
    sap = s[:, None] * qper * factorap
    muap = mu * qap / factorap
    return 1., sap, muap


class BaseTheoryPowerSpectrumMultipoles(Calculator):
    """Base for theory P_l(k); output attribute ``power`` of shape (nell, nk)."""

    _state_attrs = ['power']

    def initialize(self, k=None, ells=(0, 2, 4), **kwargs):
        if k is None:
            k = np.linspace(0.01, 0.2, 101)
        self.k = np.asarray(k, dtype='f8')
        self.ells = tuple(ells)

    def get(self):
        return self.power


class BaseTheoryCorrelationFunctionMultipoles(Calculator):
    """Base for theory xi_l(s); output attribute ``corr`` of shape (nell, ns)."""

    _state_attrs = ['corr']

    def initialize(self, s=None, ells=(0, 2, 4), **kwargs):
        if s is None:
            s = np.linspace(20., 200., 101)
        self.s = np.asarray(s, dtype='f8')
        self.ells = tuple(ells)

    def get(self):
        return self.corr


class WedgesMixin(object):
    """mu-wedge -> multipole projection (reference base.py:193-208)."""

    def set_k_mu(self, k, mu=20, method='leggauss', ells=(0, 2, 4)):
        self.k = np.asarray(k, dtype='f8')
        self.mu, wmu = weights_mu(mu, method=method)
        self.wmu = multipole_weights(ells, self.mu, wmu)   # (nell, nmu)

    def to_poles(self, pkmu):
        """pkmu (..., nk, nmu) -> (..., nell, nk)."""
        return to_poles(pkmu, self.wmu)


class APEffect(Calculator):
    r"""Alcock-Paczynski scaling (reference base.py:239).

    modes: 'qiso', 'qap', 'qisoqap', 'qparqper' (direct scaling parameters),
    'geometry' / 'bao' (computed from cosmo vs fiducial distances, the latter
    normalized by rs_drag).
    """

    @staticmethod
    def _params(init):
        mode = init.get('mode', 'geometry')
        specs = {
            'qiso': dict(value=1., prior=dict(limits=[0.8, 1.2]), ref=dict(dist='norm', loc=1., scale=0.02), delta=0.005, latex=r'q_{\rm iso}'),
            'qap': dict(value=1., prior=dict(limits=[0.8, 1.2]), ref=dict(dist='norm', loc=1., scale=0.02), delta=0.005, latex=r'q_{\rm AP}'),
            'qpar': dict(value=1., prior=dict(limits=[0.8, 1.2]), ref=dict(dist='norm', loc=1., scale=0.02), delta=0.005, latex=r'q_\parallel'),
            'qper': dict(value=1., prior=dict(limits=[0.8, 1.2]), ref=dict(dist='norm', loc=1., scale=0.02), delta=0.005, latex=r'q_\perp'),
        }
        varied = {'qiso': ['qiso'], 'qap': ['qap'], 'qisoqap': ['qiso', 'qap'],
                  'qparqper': ['qpar', 'qper'], 'geometry': [], 'bao': []}[mode]
        return {name: specs[name] for name in varied}

    def initialize(self, z=1., mode='geometry', fiducial=None, eta=1. / 3., cosmo=None):
        self.z = float(np.asarray(z))
        self.mode = str(mode)
        self.eta = float(eta)
        from ..cosmology import background as bg
        fid = bg.resolve(fiducial if isinstance(fiducial, dict) else None)
        self.fiducial = fid
        # fiducial distances (host-side, concrete)
        self.DH_fid = float(bg.hubble_distance(fid, self.z))
        self.DM_fid = float(bg.comoving_angular_distance(fid, self.z))
        self.DV_fid = float((self.DH_fid * self.DM_fid ** 2 * self.z) ** (1. / 3.)) if self.z > 0 else self.DH_fid
        self.rd_fid = float(bg.rs_drag(fid))
        if self.mode in ('geometry', 'bao'):
            self.cosmo = cosmo if cosmo is not None else Cosmology(fiducial=fiducial if isinstance(fiducial, dict) else None)

    def calculate(self, **params):
        if self.mode in ('geometry', 'bao'):
            self.DH = self.cosmo.hubble_distance(self.z)
            self.DM = self.cosmo.comoving_angular_distance(self.z)
            self.DV = (self.DH * self.DM ** 2 * self.z) ** (1. / 3.) if self.z > 0 else self.DH
            if self.mode == 'bao':
                rd = self.cosmo.rs_drag()
                qpar = (self.DH / rd) / (self.DH_fid / self.rd_fid)
                qper = (self.DM / rd) / (self.DM_fid / self.rd_fid) if self.z > 0 else qpar
            else:
                qpar = self.DH / self.DH_fid
                qper = self.DM / self.DM_fid if self.z > 0 else qpar
        elif self.mode == 'qiso':
            qpar = qper = params['qiso']
        elif self.mode == 'qap':
            qap = params['qap']
            qpar, qper = qap ** (1. - self.eta), qap ** (-self.eta)
        elif self.mode == 'qisoqap':
            qiso, qap = params['qiso'], params['qap']
            qpar, qper = qiso * qap ** (1. - self.eta), qiso * qap ** (-self.eta)
        else:  # qparqper
            qpar, qper = params['qpar'], params['qper']
        self.qpar, self.qper = qpar, qper
        self.qap = qpar / qper
        self.qiso = qpar ** self.eta * qper ** (1. - self.eta)

    def ap_k_mu(self, k, mu):
        return ap_k_mu(k, mu, qpar=self.qpar, qper=self.qper)

    def ap_s_mu(self, s, mu):
        return ap_s_mu(s, mu, qpar=self.qpar, qper=self.qper)


class BaseTheoryCorrelationFunctionFromPowerSpectrumMultipoles(BaseTheoryCorrelationFunctionMultipoles):
    """xi_l(s) from P_l(k) via FFTLog with log-slope extrapolation + Gaussian
    damping of the high-k tail (reference base.py:46-140 ``get_corr``)."""

    def initialize(self, s=None, power=None, ells=None, **kwargs):
        if s is None:
            s = np.linspace(20., 200., 101)
        self.s = np.asarray(s, dtype='f8')
        if power is None:
            from .full_shape import KaiserTracerPowerSpectrumMultipoles
            power = KaiserTracerPowerSpectrumMultipoles()
        self.power = power
        self.k = np.logspace(-4., 3., 2048)
        kw = dict(kwargs)
        if ells is not None:
            kw['ells'] = tuple(ells)
        kin = self.power.init.get('k', None)
        if kin is None:
            self.kin = np.geomspace(self.k[0], 0.6, 300)
            kw['k'] = self.kin
        else:
            self.kin = np.asarray(kin, dtype='f8')
        self.power.init.update(**kw)
        mask = self.k > self.kin[-1]
        self._logk_high = np.log10(self.k[mask] / self.kin[-1])
        self._damp_high = np.exp(-(self.k[mask] / self.kin[-1] - 1.) ** 2 / (2. * 10. ** 2))
        self._k_mid = self.k[~mask]
        self.ells = tuple(self.power.init.get('ells', (0, 2, 4)))
        self.fftlog = PowerToCorrelation(self.k, ells=self.ells, q=0, lowring=True)

    def get_corr(self, power):
        """power: (nell, nkin) -> (nell, ns) interpolated on self.s."""
        rows = []
        for ill in range(len(self.ells)):
            pk = power[ill]
            slope = (pk[-1] - pk[-2]) / np.log10(self.kin[-1] / self.kin[-2])
            mid = interp1d(np.log10(self._k_mid), np.log10(self.kin), pk, method='cubic')
            high = (pk[-1] + slope * self._logk_high) * self._damp_high
            rows.append(jnp.concatenate([mid, high], axis=-1))
        s, corr = self.fftlog(jnp.stack(rows))
        return jnp.stack([jnp.interp(self.s, s[ill], corr[ill]) for ill in range(len(self.ells))])

    def calculate(self, **params):
        self.corr = self.get_corr(self.power.power)
