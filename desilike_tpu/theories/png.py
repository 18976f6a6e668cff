"""Primordial non-Gaussianity: scale-dependent bias tracer power spectrum.

Counterpart of reference theories/galaxy_clustering/primordial_non_gaussianity.py:12.
Local-type fNL adds Delta-b(k) = b_phi * fNL / alpha(k) with
alpha(k) = sqrt(P_lin(k, z) / P_R(k)) the matter-to-curvature transfer
(b_phi = 2 dc (b1 - p), dc = 1.686).
"""

import numpy as np
import jax.numpy as jnp

from ..cosmology import linear as lin
from .base import BaseTheoryPowerSpectrumMultipoles, WedgesMixin
from .power_template import DirectPowerSpectrumTemplate


class PNGTracerPowerSpectrumMultipoles(BaseTheoryPowerSpectrumMultipoles, WedgesMixin):
    r"""fNL tracer P_l(k): (b1 + Delta b(k) + f mu^2)^2 P(k) + sn0/nd.

    Parameters
    ----------
    mode : 'b-p' (vary fnl_loc and p with b_phi = 2 dc (b1 - p)), 'bphi'
        (vary fnl_loc and bphi directly), or 'bfnl' (vary the product
        bfnl_loc = b_phi f_NL directly) — the reference's three modes
        (ref primordial_non_gaussianity.py:58-66).
    """

    @staticmethod
    def _params(init):
        mode = str(init.get('mode', 'b-p'))
        params = {
            'b1': dict(value=2., prior=dict(limits=[0., 4.]), ref=dict(dist='norm', loc=2., scale=0.1), latex='b_1'),
            'fnl_loc': dict(value=0., prior=dict(limits=[-300., 300.]), ref=dict(dist='norm', loc=0., scale=5.), latex=r'f_\mathrm{NL}^\mathrm{loc}'),
            'p': dict(value=1., fixed=True, prior=dict(limits=[0., 3.]), latex='p'),
            'bphi': dict(value=2., fixed=True, prior=dict(limits=[-10., 10.]), latex=r'b_\phi'),
            'bfnl_loc': dict(value=0., prior=dict(limits=[-1e3, 1e3]), ref=dict(limits=[-50., 50.]), latex=r'b_\phi f_\mathrm{NL}^\mathrm{loc}'),
            'sn0': dict(value=0., prior=dict(dist='norm', loc=0., scale=2.), latex='s_{n,0}'),
            'sigmas': dict(value=0., fixed=True, prior=dict(limits=[0., 10.]), latex=r'\Sigma_s'),
        }
        # per-mode pruning, as the reference does (keep_params :58-66)
        drop = {'b-p': ('bphi', 'bfnl_loc'), 'bphi': ('p', 'bfnl_loc'),
                'bfnl': ('fnl_loc', 'bphi', 'p')}.get(mode, ())
        for name in drop:
            params.pop(name, None)
        return params

    def initialize(self, k=None, ells=(0, 2, 4), template=None, mode='b-p', mu=8,
                   method='leggauss', shotnoise=1e4):
        super().initialize(k=k, ells=ells)
        self.mode = str(mode)
        if template is None:
            template = DirectPowerSpectrumTemplate()
        self.template = template
        kin = np.geomspace(min(1e-4, self.k[0] / 2), max(1., self.k[-1] * 2), 700)
        self.template.init.update(k=kin)
        self.set_k_mu(k=self.k, mu=mu, method=method, ells=self.ells)
        self.nd = 1. / float(shotnoise)
        self.delta_c = 1.686

    def calculate(self, b1=2., fnl_loc=0., p=1., bphi=2., bfnl_loc=0., sn0=0., sigmas=0., **kw):
        jac, kap, muap = self.template.ap_k_mu(self.k, self.mu)
        f = self.template.f_of_k(kap)
        pk = self.template.pk_dd_interp(kap)
        # alpha(k): matter fluctuation per unit primordial curvature
        cosmo_p = getattr(getattr(self.template, 'cosmo', None), 'p', None) or self.template.fiducial
        pr = (2. * np.pi ** 2) / kap ** 3 * lin.primordial_curvature(cosmo_p, kap)
        alpha = jnp.sqrt(pk / pr)
        if self.mode == 'bfnl':
            bfnl = bfnl_loc
        elif self.mode == 'bphi':
            bfnl = bphi * fnl_loc
        else:
            bfnl = 2. * self.delta_c * (b1 - p) * fnl_loc
        delta_b = bfnl / alpha
        fog = 1. / (1. + (sigmas * self.k[:, None] * self.mu) ** 2 / 2.) ** 2
        pkmu = jac * fog * (b1 + delta_b + f * muap ** 2) ** 2 * pk + sn0 / self.nd * 1.
        self.power = self.to_poles(pkmu)

    @property
    def z(self):
        return self.template.z

    def get(self):
        return self.power

class PNGTracerVelocityPowerSpectrumMultipoles(BaseTheoryPowerSpectrumMultipoles, WedgesMixin):
    r"""Tracer density-velocity cross power spectrum multipoles with local
    PNG scale-dependent bias (reference primordial_non_gaussianity.py:176).

    Models -i P_{gv,l}(k): the velocity field contributes a factor
    bv f mu H0/(1+z)/k (odd in mu, hence odd multipoles ells=(1, 3)),
    the density field (b1 + Delta b(k) + f mu^2); FoG damping is a
    Lorentzian in (sigmas k mu) times sinc(sigmau k) (reference :274-276).
    The full-sphere mu in [-1, 1] trapezoidal quadrature keeps the odd
    Legendre projections exact.
    """

    @staticmethod
    def _params(init):
        params = dict(PNGTracerPowerSpectrumMultipoles._params(init))
        del params['sn0']
        params['bv'] = dict(value=1., prior=dict(limits=[0., 4.]), ref=dict(dist='norm', loc=1., scale=0.1), latex='b_v')
        params['sigmau'] = dict(value=0., fixed=True, prior=dict(limits=[0., 10.]), latex=r'\Sigma_u')
        return params

    def initialize(self, k=None, ells=(1, 3), template=None, mode='b-p', mu=81):
        super().initialize(k=k, ells=ells)
        self.mode = str(mode)
        if template is None:
            template = DirectPowerSpectrumTemplate()
        self.template = template
        kin = np.geomspace(min(1e-4, self.k[0] / 2), max(1., self.k[-1] * 2), 700)
        self.template.init.update(k=kin)
        # full-sphere mu quadrature for odd multipoles; multipole_weights
        # normalizes for the [0, 1] convention, so halve for [-1, 1]
        self.set_k_mu(k=self.k, mu=np.linspace(-1., 1., int(mu)), ells=self.ells)
        self.wmu = self.wmu / 2.
        self.delta_c = 1.686

    def calculate(self, b1=2., bv=1., fnl_loc=0., p=1., bphi=2., bfnl_loc=0., sigmas=0., sigmau=0., **kw):
        jac, kap, muap = self.template.ap_k_mu(self.k, self.mu)
        f = self.template.f_of_k(kap)
        pk = self.template.pk_dd_interp(kap)
        cosmo_p = getattr(getattr(self.template, 'cosmo', None), 'p', None) or self.template.fiducial
        pr = (2. * np.pi ** 2) / kap ** 3 * lin.primordial_curvature(cosmo_p, kap)
        alpha = jnp.sqrt(pk / pr)
        if self.mode == 'bfnl':
            bfnl = bfnl_loc
        elif self.mode == 'bphi':
            bfnl = bphi * fnl_loc
        else:
            bfnl = 2. * self.delta_c * (b1 - p) * fnl_loc
        delta_b = bfnl / alpha
        # velocity kernel: v ~ f aH delta / k with aH/h = 100 E(z)/(1+z)
        # km/s/(Mpc/h).  (The reference primordial_non_gaussianity.py:274
        # omits E(z); we keep it so the amplitude scales correctly with z.)
        from ..cosmology import background as bg
        cosmo = getattr(self.template, 'cosmo', None)
        Ez = cosmo.efunc(self.z) if cosmo is not None else \
            bg.efunc(self.template.fiducial, self.z)
        vel = bv * f * muap * 100. * Ez / (1. + self.z) / kap
        # sinc damping sin(sigmau k)/(sigmau k); jnp.sinc is the normalized
        # sin(pi x)/(pi x), hence the /pi
        fog = 1. / (1. + (sigmas * kap * muap) ** 2 / 2.) \
            * jnp.sinc(sigmau * kap / jnp.pi)
        pkmu = jac * fog * (b1 + delta_b + f * muap ** 2) * vel * pk
        self.power = self.to_poles(pkmu)

    @property
    def z(self):
        return self.template.z

    def get(self):
        return self.power
