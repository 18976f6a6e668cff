"""Full-shape RSD models: Kaiser + EFT-like counterterms (1-loop EPT follows
in :mod:`desilike_tpu.theories.ept`).

Counterpart of reference theories/galaxy_clustering/full_shape.py:400-686.
The bias/counterterm structure is kept explicitly linear: tracer power is a
small matrix contraction over precomputed PT tables, which is both
MXU-friendly and exactly the structure analytic marginalization exploits.
"""

import re

import numpy as np
import jax.numpy as jnp

from ..core import Calculator
from .base import (BaseTheoryPowerSpectrumMultipoles, WedgesMixin,
                   BaseTheoryCorrelationFunctionFromPowerSpectrumMultipoles)
from .power_template import DirectPowerSpectrumTemplate, StandardPowerSpectrumTemplate, ShapeFitPowerSpectrumTemplate


class BasePTPowerSpectrumMultipoles(BaseTheoryPowerSpectrumMultipoles, WedgesMixin):
    """Base PT multipoles: template wiring with AP margin (reference full_shape.py:15)."""

    _klim = (1e-3, 1., 500)

    def initialize(self, k=None, ells=(0, 2, 4), template=None, mu=8, method='leggauss', **kwargs):
        super().initialize(k=k, ells=ells)
        if template is None:
            template = DirectPowerSpectrumTemplate()
        self.template = template
        kin = np.geomspace(min(self._klim[0], self.k[0] / 2), max(self._klim[1], self.k[-1] * 2), self._klim[2])
        self.template.init.update(k=kin)
        self.set_k_mu(k=self.k, mu=mu, method=method, ells=self.ells)

    @property
    def z(self):
        return self.template.z


class KaiserPowerSpectrumMultipoles(BasePTPowerSpectrumMultipoles):
    r"""Kaiser PT tables (reference full_shape.py:464): pk_dd/dt/tt multipoles
    on the AP-remapped grid, with optional Gaussian damping."""

    _params = {'sigmapar': dict(value=0., fixed=True), 'sigmaper': dict(value=0., fixed=True)}
    _state_attrs = ['power', 'pktable']

    def calculate(self, sigmapar=0., sigmaper=0., **kw):
        jac, kap, muap = self.template.ap_k_mu(self.k, self.mu)
        f = self.template.f_of_k(kap)
        sigmanl2 = kap ** 2 * (sigmapar ** 2 * muap ** 2 + sigmaper ** 2 * (1. - muap ** 2))
        damping = jnp.exp(-sigmanl2 / 2.)
        pkmu = jac * damping * self.template.pk_dd_interp(kap)
        self.pktable = {
            'pk_dd': self.to_poles(pkmu),
            'pk_dt': self.to_poles(f * muap ** 2 * pkmu),
            'pk_tt': self.to_poles(f ** 2 * muap ** 4 * pkmu),
        }
        self.pktable['pk11'] = self.pktable['pk_dd']
        self.power = self.pktable['pk_dd']


class BaseTracerPowerSpectrumMultipoles(BaseTheoryPowerSpectrumMultipoles):
    """Tracer-level wrapper: combines PT tables with bias parameters."""

    _pt_cls = KaiserPowerSpectrumMultipoles

    def initialize(self, k=None, ells=(0, 2, 4), pt=None, template=None, shotnoise=1e4, **kwargs):
        super().initialize(k=k, ells=ells)
        if pt is None:
            pt = self._pt_cls()
        self.pt = pt
        if template is not None:
            self.pt.init.update(template=template)
        self.pt.init.update(k=self.k, ells=self.ells, **kwargs)
        self.nd = 1. / float(shotnoise)

    @property
    def template(self):
        return self.pt.template

    def get(self):
        return self.power


class KaiserTracerPowerSpectrumMultipoles(BaseTracerPowerSpectrumMultipoles):
    r"""Kaiser tracer P_l(k) (reference full_shape.py:518):
    b1^2 pk_dd + 2 b1 pk_dt + pk_tt + sn0/nd."""

    _params = {
        'b1': dict(value=1.5, prior=dict(limits=[0., 4.]), ref=dict(dist='norm', loc=1.5, scale=0.1), delta=0.05, latex='b_1'),
        'sn0': dict(value=0., prior=dict(dist='norm', loc=0., scale=2.), ref=dict(dist='norm', loc=0., scale=0.01), delta=0.05, latex='s_{n,0}'),
    }

    def calculate(self, b1=1., sn0=0., **kw):
        sn = np.array([float(ell == 0) for ell in self.ells])[:, None] * sn0 / self.nd
        t = self.pt.pktable
        self.power = b1 ** 2 * t['pk_dd'] + 2. * b1 * t['pk_dt'] + t['pk_tt'] + sn


class EFTLikeKaiserTracerPowerSpectrumMultipoles(KaiserTracerPowerSpectrumMultipoles):
    r"""Kaiser + EFT counter/stochastic terms (reference full_shape.py:577-686):
    power += ct-matrix . ct * pk11(ell=0) + sn-matrix . sn / nd.
    Exactly marginalizable over ct*/sn* (stochastic terms have a static
    design matrix; counterterms multiply the traced pk11)."""

    _static_linear_solved = ('sn*',)

    @staticmethod
    def _params(init):
        params = dict(KaiserTracerPowerSpectrumMultipoles._params)
        ells = tuple(init.get('ells', (0, 2, 4)))
        for ell in ells:
            params['ct{:d}_2'.format(ell)] = dict(
                value=0., prior=dict(dist='norm', loc=0., scale=100.),
                ref=dict(dist='norm', loc=0., scale=1.), delta=0.5,
                latex='c_{{t,{:d}}}'.format(ell))
            params['sn{:d}_2'.format(ell)] = dict(
                value=0., prior=dict(dist='norm', loc=0., scale=10.),
                ref=dict(dist='norm', loc=0., scale=0.1), delta=0.1,
                latex='s_{{n,{:d}}}'.format(ell))
        return params

    def initialize(self, *args, **kwargs):
        super().initialize(*args, **kwargs)
        self.kp = 1.
        self._set_eft_matrices()

    def _set_eft_matrices(self):
        def build(base):
            names, rows = [], {}
            for param in self.params:
                match = re.match(base + r'(\d+)_(-?\d+)', param.basename)
                if match:
                    ell, pow = int(match.group(1)), int(match.group(2))
                    if ell in self.ells:
                        names.append(param.basename)
                        rows[param.basename] = (ell, (self.k / self.kp) ** pow)
                    else:
                        del self.params[param.name]
            matrix = np.zeros((len(self.ells), len(self.k), len(names)))
            for i, name in enumerate(names):
                ell, kvec = rows[name]
                matrix[self.ells.index(ell), :, i] = kvec
            return names, matrix

        self.counterterm_params, self.counterterm_matrix = build('ct')
        self.stochastic_params, self.stochastic_matrix = build('sn')
        # counterterms are exactly linear with a traced basis (x pk11): expose
        # the analytic marginalization bases (likelihoods/base.py protocol)
        self.solved_basis_names = tuple(self.counterterm_params)

    def solved_power_basis(self, basename):
        """d power / d ct_name, evaluated post-calculate (traced)."""
        i = self.counterterm_params.index(basename)
        pk11_0 = self.pt.pktable['pk11'][self.pt.ells.index(0)]
        return jnp.asarray(self.counterterm_matrix[:, :, i]) * pk11_0

    def calculate(self, b1=1., sn0=0., **params):
        super().calculate(b1=b1, sn0=sn0)
        ct = jnp.stack([jnp.asarray(params.get(name, 0.)) for name in self.counterterm_params]) if self.counterterm_params else None
        sn = jnp.stack([jnp.asarray(params.get(name, 0.)) for name in self.stochastic_params]) if self.stochastic_params else None
        if ct is not None:
            pk11_0 = self.pt.pktable['pk11'][self.pt.ells.index(0)]
            self.power = self.power + jnp.einsum('lkc,c->lk', jnp.asarray(self.counterterm_matrix), ct) * pk11_0
        if sn is not None:
            self.power = self.power + jnp.einsum('lkc,c->lk', jnp.asarray(self.stochastic_matrix), sn) / self.nd


class BaseTracerCorrelationFunctionMultipoles(BaseTheoryCorrelationFunctionFromPowerSpectrumMultipoles):
    """Tracer xi_l(s) from the matching tracer P_l(k)."""

    _power_cls = KaiserTracerPowerSpectrumMultipoles

    def initialize(self, s=None, ells=(0, 2, 4), **kwargs):
        power = self._power_cls()
        super().initialize(s=s, power=power, ells=ells, **kwargs)


class KaiserTracerCorrelationFunctionMultipoles(BaseTracerCorrelationFunctionMultipoles):
    _power_cls = KaiserTracerPowerSpectrumMultipoles


class EFTLikeKaiserTracerCorrelationFunctionMultipoles(BaseTracerCorrelationFunctionMultipoles):
    _power_cls = EFTLikeKaiserTracerPowerSpectrumMultipoles


class SimpleTracerPowerSpectrumMultipoles(BaseTheoryPowerSpectrumMultipoles, WedgesMixin):
    r"""Minimal damped-Kaiser tracer model (reference full_shape.py:394):
    pkmu = jac * exp(-k^2(sigmapar^2 mu^2 + sigmaper^2(1-mu^2))/2)
           * (b1 + f muap^2)^2 P(kap) + sn0/nd."""

    _params = {
        'b1': dict(value=1.5, prior=dict(limits=[0., 4.]), ref=dict(dist='norm', loc=1.5, scale=0.1), latex='b_1'),
        'sn0': dict(value=0., prior=dict(dist='norm', loc=0., scale=2.), latex='s_{n,0}'),
        'sigmapar': dict(value=0., fixed=True, prior=dict(limits=[0., 10.]), latex=r'\Sigma_\parallel'),
        'sigmaper': dict(value=0., fixed=True, prior=dict(limits=[0., 10.]), latex=r'\Sigma_\perp'),
    }

    def initialize(self, k=None, ells=(0, 2, 4), template=None, mu=8, method='leggauss', shotnoise=1e4):
        super().initialize(k=k, ells=ells)
        if template is None:
            template = StandardPowerSpectrumTemplate()
        self.template = template
        kin = np.geomspace(min(1e-3, self.k[0] / 2), max(1., self.k[-1] * 2), 500)
        self.template.init.update(k=kin)
        self.set_k_mu(k=self.k, mu=mu, method=method, ells=self.ells)
        self.nd = 1. / float(shotnoise)

    def calculate(self, b1=1.5, sn0=0., sigmapar=0., sigmaper=0., **kw):
        jac, kap, muap = self.template.ap_k_mu(self.k, self.mu)
        f = self.template.f_of_k(kap)
        k, mu = self.k[:, None], self.mu
        damping = jnp.exp(-k ** 2 * (sigmapar ** 2 * mu ** 2 + sigmaper ** 2 * (1. - mu ** 2)) / 2.)
        pkmu = jac * damping * (b1 + f * muap ** 2) ** 2 * self.template.pk_dd_interp(kap) + sn0 / self.nd
        self.power = self.to_poles(pkmu)

    @property
    def z(self):
        return self.template.z

    def get(self):
        return self.power
