"""TNS (Taruya-Nishimichi-Saito 2010) redshift-space full-shape model.

Counterpart of reference full_shape.py:688-1043 (TNSPowerSpectrumMultipoles
and tracer wrappers). Physics: 1-loop P_dd/P_dt/P_tt with McDonald-Roy
biasing (including the third-order b3nl sigma3^2 term), the A and B RSD
correction terms of arXiv:1006.0699, and a Lorentzian/Gaussian finger-of-god
damping with free sigmav.

Structure: reuses the EPT node's fused machinery (FFTLog/quadrature 1-loop
tables, Chebyshev AP interpolation, exact-marginalizable EFT counter/
stochastic terms); the TNS A/B tables come from ops/tns.py static-grid
reductions. One traced XLA program end to end.
"""

import numpy as np
import jax.numpy as jnp

from ..ops.tns import TNSCorrections
from .ept import EPTTracerPowerSpectrumMultipoles
from .full_shape import BaseTracerCorrelationFunctionMultipoles


class EFTLikeTNSTracerPowerSpectrumMultipoles(EPTTracerPowerSpectrumMultipoles):
    """TNS tracer multipoles with EFT-like counter/stochastic terms
    (reference full_shape.py:992 EFTLikeTNSTracerPowerSpectrumMultipoles)."""

    @staticmethod
    def _params(init):
        params = EPTTracerPowerSpectrumMultipoles._params(init)
        params['b3'] = dict(value=0., prior=dict(dist='norm', loc=0., scale=5.),
                            ref=dict(dist='norm', loc=0., scale=0.5), delta=0.5, latex='b_3')
        params['sigmav'] = dict(value=4., prior=dict(limits=[0., 15.]),
                                ref=dict(dist='norm', loc=4., scale=0.5), delta=0.5,
                                latex=r'\sigma_v')
        return params

    def initialize(self, *args, fog='lorentzian', nq_tns=300, nmu_tns=16, **kwargs):
        super().initialize(*args, **kwargs)
        if fog not in ('lorentzian', 'gaussian'):
            raise ValueError("fog must be 'lorentzian' or 'gaussian'")
        self.fog = str(fog)
        lo, hi = self._tmpl_lims
        self.tns = TNSCorrections(self.k_work, qrange=(max(lo, 1e-4), min(hi, 10.)),
                                  nq=int(nq_tns), nmu=int(nmu_tns))

    def calculate(self, b1=1.7, b2=0., bs=0., b3=0., sigmav=4., sn0=0., **params):
        pk_fn = self._pk_fn()
        t = self.loop.tables(pk_fn)
        c = self.tns.tables(pk_fn)
        pk_lin_w = self.template.pk_dd_interp(jnp.asarray(self.k_work))

        # coevolution-shifted quadratic/cubic biases (McDonald-Roy; reference
        # full_shape.py:962-966)
        bs2 = bs - 4. / 7. * (b1 - 1.)
        b3nl = b3 + 32. / 315. * (b1 - 1.)
        sig3_pk = c['sig3sq'] * pk_lin_w

        pgg_dd = (b1 ** 2 * (pk_lin_w + t['p22_dd'] + t['p13_dd'])
                  + 2. * b1 * b2 * t['pb2_d'] + 2. * b1 * bs2 * t['pbs2_d']
                  + 2. * b1 * b3nl * sig3_pk
                  + b2 ** 2 * t['pb22'] + 2. * b2 * bs2 * t['pb2s2'] + bs2 ** 2 * t['pbs22'])
        pgg_dt = (b1 * (pk_lin_w + t['p22_dt'] + t['p13_dt'])
                  + b2 * t['pb2_t'] + bs2 * t['pbs2_t'] + b3nl * sig3_pk)
        p_tt = pk_lin_w + t['p22_tt'] + t['p13_tt']

        jac, kap, muap = self.template.ap_k_mu(self.k, self.mu)
        # scale-dependent under the eh99 engine (see ept.py); the A/B loop
        # corrections keep the standard EdS kernels
        f = self.template.f_of_k(kap) if hasattr(self.template, 'f_of_k') else self.template.f
        cheb = self._work_cheb

        def to_ap(table):
            return cheb.evaluate(cheb.coeffs(table), kap)

        dd_ap = to_ap(pgg_dd)
        dt_ap = to_ap(pgg_dt)
        tt_ap = to_ap(p_tt)
        plin_ap = self.template.pk_dd_interp(kap)

        mu2, mu4, mu6, mu8 = muap ** 2, muap ** 4, muap ** 6, muap ** 8
        A = [to_ap(c['A'][m]) for m in range(5)]
        B = [to_ap(c['B'][j]) for j in range(12)]
        # Taruya 2010 assembly grouped by powers of b1 (reference :893-898)
        a_term = (b1 ** 2 * f * A[0] * mu2
                  + b1 * f ** 2 * (A[1] * mu2 + A[2] * mu4)
                  + f ** 3 * (A[3] * mu4 + A[4] * mu6))
        b_term = (b1 ** 2 * f ** 2 * (B[0] * mu2 + B[4] * mu4)
                  - b1 * f ** 3 * ((B[1] + B[2]) * mu2 + (B[5] + B[6]) * mu4 + (B[8] + B[9]) * mu6)
                  + f ** 4 * (B[3] * mu2 + B[7] * mu4 + B[10] * mu6 + B[11] * mu8))

        pkmu_pt = dd_ap + 2. * f * mu2 * dt_ap + f ** 2 * mu4 * tt_ap + a_term + b_term
        if self.fog == 'lorentzian':
            damping = 1. / (1. + (sigmav * kap * muap) ** 2 / 2.) ** 2
        else:
            damping = jnp.exp(-(sigmav * kap * muap) ** 2)
        pkmu = jac * damping * pkmu_pt

        # EFT counterterms + stochastic terms (same machinery as EPT)
        mu_pows = {0: 1., 2: mu2, 4: mu4}
        self._ct_bases = {}
        for name in self.ct_names:
            ell = self.ct_ells[name]
            ct = params.get(name, 0.)
            basis_mu = mu_pows[ell] * kap ** 2 * plin_ap * jac
            self._ct_bases[name] = self.to_poles(jnp.broadcast_to(basis_mu, pkmu.shape))
            pkmu = pkmu + ct * basis_mu
        k_ = self.k[:, None]
        sn2 = params.get('sn2_2', 0.)
        pkmu = pkmu + (sn0 + sn2 * k_ ** 2 * self.mu ** 2) / self.nd
        self.power = self.to_poles(pkmu)
        self.pktable = {'pk11': self.to_poles(jnp.broadcast_to(plin_ap, pkmu.shape))}


class TNSTracerPowerSpectrumMultipoles(EFTLikeTNSTracerPowerSpectrumMultipoles):
    """Plain TNS (no EFT counterterms; reference full_shape.py:920)."""

    @staticmethod
    def _params(init):
        params = EFTLikeTNSTracerPowerSpectrumMultipoles._params(init)
        for name in list(params):
            if name.startswith('ct') or name == 'sn2_2':
                del params[name]
        return params


class EFTLikeTNSTracerCorrelationFunctionMultipoles(BaseTracerCorrelationFunctionMultipoles):
    """TNS + EFT-like terms xi_l(s) via FFTLog of the pk model
    (reference full_shape.py:1019)."""

    _power_cls = EFTLikeTNSTracerPowerSpectrumMultipoles


class TNSTracerCorrelationFunctionMultipoles(BaseTracerCorrelationFunctionMultipoles):
    """Plain TNS xi_l(s) (reference full_shape.py:968)."""

    _power_cls = TNSTracerPowerSpectrumMultipoles
