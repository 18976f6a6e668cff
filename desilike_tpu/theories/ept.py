"""1-loop Eulerian PT full-shape model (velocileptors/FOLPS-class physics).

Counterpart of the reference's external-PT wrappers (full_shape.py:1229
velocileptors, :2301 folpsax): here the 1-loop spectra are computed
in-framework on static quadrature grids (:mod:`desilike_tpu.ops.spt`) with
the linear pk evaluated through Chebyshev spectral tables — the whole model
is one fused, differentiable XLA program, including direct-cosmology
dependence through the EH98 backend.

Model: EFT-like Kaiser at one loop,
  P_g(k, mu) = Pgg_dd + 2 f mu^2 Pgg_dt + f^2 mu^4 P_tt
             + (ct0 + ct2 mu^2 + ct4 mu^4) k^2 P_lin + (sn0 + sn2 k^2 mu^2)/nd
with the McDonald-Roy quadratic bias basis (b1, b2, bs2) and all
counter/stochastic terms exactly marginalizable.

IR resummation (default resum='full', matching every 1-loop model the
reference exposes: velocileptors ept_fullresum ref full_shape.py:1447,
pybird Resum with_resum='full' :1649-1660, folpsax :2301): wiggle/no-wiggle
split of the linear input, damping scales Sigma^2/deltaSigma^2 from
(1 - j0 + 2 j2)/j2 integrals of P_nw against the fiducial sound horizon,
loops run on the LO-resummed input, and the tree term carries the full
mu-dependent damping with the leading-order wiggle correction
(1 + k^2 Sigma_tot^2) that cancels the loop's double-counted damped wiggle.
"""

import re

import numpy as np
import jax.numpy as jnp

from ..ops.spt import OneLoopIntegrals
from ..ops.chebyshev import ChebyshevLogInterp
from .base import BaseTheoryPowerSpectrumMultipoles, WedgesMixin
from .full_shape import BasePTPowerSpectrumMultipoles, BaseTracerCorrelationFunctionMultipoles
from .power_template import DirectPowerSpectrumTemplate


def physical_stochastic_settings(tracer=None):
    """Per-tracer satellite fraction and virial-velocity scale entering the
    physical stochastic priors (reference full_shape.py:1077-1091, the
    published DESI-2024 convention, Maus et al. / Zhao et al.): sigv is the
    halo virial velocity 150 km/s (M / 1e10 Msun)^(1/3) sqrt(1+z) / H0 in
    Mpc/h units, evaluated at each tracer's host-halo mass and redshift."""
    if tracer is None:
        return {'fsat': 0.1, 'sigv': 5.}
    settings = {
        'BGS': {'fsat': 0.15, 'sigv': 150. * 10. ** (1. / 3.) * (1. + 0.2) ** 0.5 / 70.},
        'LRG': {'fsat': 0.15, 'sigv': 150. * 10. ** (1. / 3.) * (1. + 0.8) ** 0.5 / 70.},
        'ELG': {'fsat': 0.10, 'sigv': 150. * 2.1 ** 0.5 / 70.},
        'QSO': {'fsat': 0.03, 'sigv': 150. * 10. ** (0.7 / 3.) * 2.4 ** 0.5 / 70.},
    }
    tracer = str(tracer).upper()
    if tracer not in settings:
        raise ValueError('unknown tracer {!r}; expected one of {}'.format(
            tracer, sorted(settings)))
    return settings[tracer]


class EPTTracerPowerSpectrumMultipoles(BaseTheoryPowerSpectrumMultipoles, WedgesMixin):
    """1-loop EPT biased-tracer multipoles with AP and exact-marginalizable
    counter/stochastic terms.

    Two parameter bases (reference full_shape.py:1119-1134, 1299-1307):

    - ``prior_basis='eulerian'`` (default): b1/b2/bs/b3nl McDonald-Roy
      biases, per-multipole counterterms ct{l}_2, shot-noise sn0/sn2_2/sn4_2;
    - ``prior_basis='physical'``: the DESI-2024 convention — sigma8-scaled
      b1p/b2p/bsp/b3p, dimensionless alpha{0,2,4}p counterterm amplitudes in
      the velocileptors growth/bias combinations, sn{0,2,4}p stochastic
      terms normalized by the shot noise with per-tracer ``fsat``/``sigv``
      presets (``tracer='LRG'|'ELG'|'QSO'|'BGS'``, or explicit overrides).

    ``freedom='min'|'max'`` applies the reference's parameter-freedom
    presets in either basis.
    """

    _static_linear_solved = ('sn*',)
    _klim_template = (1e-4, 20., 1200)

    @staticmethod
    def _params(init):
        ells = tuple(init.get('ells', (0, 2, 4)))
        prior_basis = init.get('prior_basis', 'eulerian') or 'eulerian'
        freedom = init.get('freedom', None)
        if prior_basis == 'physical':
            # DESI-2024 physical prior basis (reference full_shape.py:1119-1134:
            # sigma8-scaled biases, dimensionless counterterm amplitudes
            # "50% at k = 0.2 h/Mpc", shot-noise-normalized stochastic terms)
            params = {
                'b1p': dict(value=1.2, prior=dict(dist='uniform', limits=[0., 3.]),
                            ref=dict(dist='norm', loc=1., scale=0.1), delta=0.05,
                            latex=r'b_{1}\sigma_8'),
                'b2p': dict(value=0., prior=dict(dist='norm', loc=0., scale=5.),
                            ref=dict(dist='norm', loc=0., scale=1.), delta=0.5,
                            latex=r'b_{2}\sigma_8^2'),
                'bsp': dict(value=0., prior=dict(dist='norm', loc=0., scale=5.),
                            ref=dict(dist='norm', loc=0., scale=1.), delta=0.5,
                            latex=r'b_{s}\sigma_8^2'),
                'b3p': dict(value=0., fixed=True, prior=dict(dist='norm', loc=0., scale=5.),
                            latex=r'b_{3}\sigma_8^3'),
            }
            for n, need in (('0', True), ('2', 2 in ells), ('4', 4 in ells)):
                params['alpha{}p'.format(n)] = dict(
                    value=0., fixed=not need,
                    prior=dict(dist='norm', loc=0., scale=12.5),
                    ref=dict(dist='norm', loc=0., scale=1.), delta=0.5,
                    latex=r'\alpha_{{{}}}'.format(n))
            params['sn0p'] = dict(value=0., prior=dict(dist='norm', loc=0., scale=2.),
                                  ref=dict(dist='norm', loc=0., scale=1.),
                                  latex=r'\mathrm{SN}_0')
            params['sn2p'] = dict(value=0., fixed=2 not in ells,
                                  prior=dict(dist='norm', loc=0., scale=5.),
                                  ref=dict(dist='norm', loc=0., scale=1.),
                                  latex=r'\mathrm{SN}_2')
            params['sn4p'] = dict(value=0., fixed=True,  # ref fixes sn4 by default
                                  prior=dict(dist='norm', loc=0., scale=5.),
                                  ref=dict(dist='norm', loc=0., scale=1.),
                                  latex=r'\mathrm{SN}_4')
            if freedom == 'min':
                for name in ('bsp', 'b3p'):
                    params[name].update(value=0., fixed=True)
                params['b2p']['prior'] = dict(dist='norm', loc=0., scale=10.)
            elif freedom == 'max':
                for name in ('b2p', 'bsp', 'b3p'):
                    params[name].update(fixed=False,
                                        prior=dict(limits=[-15., 15.]))
            return params
        params = {
            'b1': dict(value=1.7, prior=dict(limits=[0., 4.]), ref=dict(dist='norm', loc=1.7, scale=0.1), delta=0.05, latex='b_1'),
            'b2': dict(value=0., prior=dict(dist='norm', loc=0., scale=5.), ref=dict(dist='norm', loc=0., scale=0.5), delta=0.5, latex='b_2'),
            'bs': dict(value=0., prior=dict(dist='norm', loc=0., scale=5.), ref=dict(dist='norm', loc=0., scale=0.5), delta=0.5, latex='b_s'),
            'b3nl': dict(value=0., prior=dict(dist='norm', loc=0., scale=5.), ref=dict(dist='norm', loc=0., scale=0.5), delta=0.5, latex='b_{3nl}'),
            'sn0': dict(value=0., prior=dict(dist='norm', loc=0., scale=2.), ref=dict(dist='norm', loc=0., scale=0.1), latex='s_{n,0}'),
        }
        for ell in ells:
            params['ct{:d}_2'.format(ell)] = dict(
                value=0., prior=dict(dist='norm', loc=0., scale=100.),
                ref=dict(dist='norm', loc=0., scale=1.), delta=0.5, latex='c_{{t,{:d}}}'.format(ell))
        params['sn2_2'] = dict(value=0., prior=dict(dist='norm', loc=0., scale=10.),
                               ref=dict(dist='norm', loc=0., scale=0.1), latex='s_{n,2}')
        params['sn4_2'] = dict(value=0., fixed=True,  # ref fixes sn4 by default
                               prior=dict(dist='norm', loc=0., scale=10.),
                               ref=dict(dist='norm', loc=0., scale=0.1), latex='s_{n,4}')
        # reference freedom presets (full_shape.py:1102-1116), mapped to the
        # Eulerian basis: 'min' fixes the quadratic-and-up bias freedom,
        # 'max' opens it with wide flat priors (ct/sn keep their Gaussian
        # priors here — they are analytically marginalized)
        if freedom == 'min':
            for name in ('bs', 'b3nl'):
                params[name].update(value=0., fixed=True)
            params['b2']['prior'] = dict(dist='norm', loc=0., scale=10.)
        elif freedom == 'max':
            for name in ('b2', 'bs', 'b3nl'):
                params[name].update(fixed=False, prior=dict(limits=[-15., 15.]))
        return params

    def initialize(self, k=None, ells=(0, 2, 4), template=None, mu=8, method='leggauss',
                   shotnoise=1e4, nr=128, nx=64, nk_loop=96, nk_template=None,
                   loop_method='fftlog', resum='full', resum_ks=0.4,
                   prior_basis='eulerian', freedom=None, tracer=None,
                   fsat=None, sigv=None, **kwargs):
        if resum not in (None, False, 'full'):
            raise ValueError("resum must be 'full' or None (got {!r})".format(resum))
        self.resum = 'full' if resum == 'full' else None
        if prior_basis not in ('eulerian', 'physical', None):
            raise ValueError("prior_basis must be 'eulerian' or 'physical' "
                             '(got {!r})'.format(prior_basis))
        self.physical = (prior_basis == 'physical')
        if self.physical:
            settings = physical_stochastic_settings(tracer=tracer)
            self.fsat = float(fsat if fsat is not None else settings['fsat'])
            self.sigv = float(sigv if sigv is not None else settings['sigv'])
        super().initialize(k=k, ells=ells)
        if template is None:
            template = DirectPowerSpectrumTemplate()
        self.template = template
        lo, hi, nk_tmpl = self._klim_template
        if nk_template is not None:
            nk_tmpl = int(nk_template)
        self.template.init.update(k=np.geomspace(lo, hi, nk_tmpl))
        self.set_k_mu(k=self.k, mu=mu, method=method, ells=self.ells)
        self.nd = 1. / float(shotnoise)
        # loop working grid: covers the AP-shifted output range, clamped to
        # the template limits (the xi path hands in a kin grid reaching the
        # template's low-k edge, where the 0.6x margin would undershoot it)
        lo_t, hi_t = self.template.init['k'][0], self.template.init['k'][-1]
        klo = max(self.k[0] * 0.6, lo_t * (1. + 1e-6))
        khi = min(self.k[-1] * 1.7, hi_t * (1. - 1e-6))
        if klo >= khi:
            raise ValueError(
                'requested output k-range [{:.4g}, {:.4g}] h/Mpc is incompatible with '
                'the template k-grid [{:.4g}, {:.4g}]: the loop working range is empty. '
                'Widen the template k limits (nk_template / template k=) or move the '
                'output range inside them.'.format(self.k[0], self.k[-1], lo_t, hi_t))
        self.k_work = np.geomspace(klo, khi, int(nk_loop))
        if str(loop_method) == 'fftlog':
            # FFTLog-matrix loops (ops/spt_fftlog.py): per-eval cost is one
            # FFT + complex quadratic forms; validated vs quadrature to <1e-3
            from ..ops.spt_fftlog import FFTLogOneLoop
            self.loop = FFTLogOneLoop(self.k_work)
        else:
            self.loop = OneLoopIntegrals(self.k_work, nr=int(nr), nx=int(nx))
        self._work_cheb = ChebyshevLogInterp(self.k_work, log_values=False)
        self._tmpl_lims = (self.template.init['k'][0], self.template.init['k'][-1])
        self._loop_eval_mat = None  # built lazily (needs the template's basis)
        if self.resum:
            self._resum_static_setup(float(resum_ks))
        self._set_eft_matrices()

    def _resum_static_setup(self, ks):
        r"""Static quadrature for the IR-damping scales (arXiv:1605.02149 /
        FOLPS conventions; reference counterparts: velocileptors
        ept_fullresum, ref full_shape.py:1447; pybird Resum, :1649-1660):

          Sigma^2      = 1/(6 pi^2) \int_0^{ks} dq P_nw(q) [1 - j0(q l) + 2 j2(q l)]
          deltaSigma^2 = 1/(2 pi^2) \int_0^{ks} dq P_nw(q) j2(q l)

        with l the fiducial sound horizon (the BAO wiggle wavelength) and
        ks the IR separation scale. P_nw is traced (per-evaluation), so only
        the q grid, trapezoid weights and Bessel factors are static."""
        from scipy.special import spherical_jn
        self.template.runtime_info.initialize()  # for rs_drag_fid
        l_bao = float(getattr(self.template, 'rs_drag_fid', 104.))
        lo_t = self.template.init['k'][0]
        qs = np.geomspace(max(1e-4, lo_t * (1. + 1e-6)), ks, 192)
        w = np.zeros_like(qs)
        d = np.diff(qs)
        w[:-1] += d / 2.
        w[1:] += d / 2.
        j0 = spherical_jn(0, qs * l_bao)
        j2 = spherical_jn(2, qs * l_bao)
        self._resum_q = qs
        self._resum_w_sigma = w * (1. - j0 + 2. * j2) / (6. * np.pi ** 2)
        self._resum_w_dsigma = w * j2 / (2. * np.pi ** 2)

    def _resum_scales(self, pknw_rq):
        """(Sigma^2, deltaSigma^2, f0, Sigma^2_iso) from P_nw on the static
        damping grid; Sigma^2_iso is the angle average of Sigma^2_tot(mu),
        used to damp the loop INPUT (the loop corrections' own mu-dependent
        damping is beyond leading-order wiggle counting)."""
        sigma2 = jnp.sum(jnp.asarray(self._resum_w_sigma, dtype=pknw_rq.dtype) * pknw_rq)
        dsigma2 = jnp.sum(jnp.asarray(self._resum_w_dsigma, dtype=pknw_rq.dtype) * pknw_rq)
        f0 = self.template.f  # scalar growth rate (scale-dependence is subleading here)
        s2_iso = (1. + f0 * (2. + f0) / 3.) * sigma2 - (2. / 15.) * f0 ** 2 * dsigma2
        return sigma2, dsigma2, f0, s2_iso

    def _loop_static_setup(self):
        """Static Chebyshev design matrix from the template basis to ALL the
        loop-path grids (decomposition samples, k_work, the (k, r) radial
        product grid, the sigma_v2 quadrature): per evaluation the linear pk
        lands on every loop grid with ONE (npts, order) matmul on the MXU,
        replacing ~25k Clenshaw recurrences whose order-long sequential
        chains are VPU-bound (the dominant cost of the fused EPT program)."""
        from ..ops.spt_fftlog import SIGMA_V2_Q
        loop = self.loop
        kq = np.outer(loop.k, loop.r).ravel()
        pts = np.concatenate([loop.x_grid, loop.k, kq, SIGMA_V2_Q])
        self._loop_eval_mat = self.template._cheb.evaluation_matrix(pts)
        lo, hi = self._tmpl_lims
        self._loop_mask = ((pts > lo) & (pts < hi)).astype('f8')
        self._loop_sizes = (len(loop.x_grid), len(loop.k), kq.size, len(SIGMA_V2_Q))
        self._loop_pts2 = pts ** 2  # for the IR damping of the loop input
        if self.resum:
            self._resum_mat = self.template._cheb.evaluation_matrix(self._resum_q)
        # k_work must sit inside the template range for pk_lin to be exact
        n1, n2 = self._loop_sizes[:2]
        assert self._loop_mask[n1:n1 + n2].all(), 'k_work outside the template k range'

    def _set_eft_matrices(self):
        if self.physical:
            # physical basis: dimensionless alpha_n amplitudes; still exactly
            # linear given (b1p, f), so in-primal marginalization bases are
            # exposed for them (rows built in calculate)
            self.ct_names, self.ct_ells = [], {}
            self.solved_basis_names = ('alpha0p', 'alpha2p', 'alpha4p')
            return

        def build(base):
            names, rows = [], {}
            for param in self.params:
                match = re.match(base + r'(\d+)_2$', param.basename)
                if match:
                    ell = int(match.group(1))
                    if ell in self.ells:
                        names.append(param.basename)
                        rows[param.basename] = ell
                    else:
                        del self.params[param.name]
            return names, rows

        self.ct_names, self.ct_ells = build('ct')
        # exact linear counterterms: expose analytic marginalization bases
        self.solved_basis_names = tuple(self.ct_names)

    def _pk_fn(self):
        """Masked linear pk evaluator: zero outside the template table range
        (avoids fake constant tails in the loop integrands)."""
        lo, hi = self._tmpl_lims
        interp = self.template.pk_dd_interp

        def fn(kq):
            return interp(kq) * ((kq > lo) & (kq < hi))
        return fn

    def calculate(self, b1=1.7, b2=0., bs=0., b3nl=0., sn0=0., **params):
        if self.physical:
            # physical -> Eulerian conversion (reference full_shape.py:
            # 1299-1307, sigma8-scaled biases; b1p = b1 sigma8 so the
            # Lagrangian b1L = b1p/sigma8 - 1 and Eulerian b1 = b1p/sigma8)
            sigma8 = getattr(self.template, 'sigma8', None)
            if sigma8 is None:
                sigma8 = self.template.fsigma8 / self.template.f
            b1 = params.get('b1p', 1.2) / sigma8
            b2 = params.get('b2p', 0.) / sigma8 ** 2
            bs = params.get('bsp', 0.) / sigma8 ** 2
            b3nl = params.get('b3p', 0.) / sigma8 ** 3
            sn0 = params.get('sn0p', 0.)
        from ..ops.spt_fftlog import FFTLogOneLoop
        resum = self.resum
        sigma2 = dsigma2 = f0 = None
        if isinstance(self.loop, FFTLogOneLoop):
            if self._loop_eval_mat is None:
                self._loop_static_setup()
            coeffs = self.template.pk_dd_coeffs()
            from ..config import loop_matmul_precision
            n1, n2, n3, n4 = self._loop_sizes
            # split-precision landing: the k_work rows feed the LINEAR term
            # (global precision); everything else feeds loop corrections only
            # (relaxed precision, see config.loop_matmul_precision)
            mat = self._loop_eval_mat
            mask = jnp.asarray(self._loop_mask, dtype=coeffs.dtype)
            if resum:
                # IR resummation: the loop integrals run on the LO-resummed
                # input P_nw + exp(-k^2 Sigma^2_iso) P_w — the wiggle split
                # lands on every loop grid through the same static design
                # matrix (one stacked MXU matmul for full + no-wiggle)
                coeffs_nw = self.template.pknow_dd_coeffs()
                stacked = jnp.stack([coeffs, coeffs_nw])
                pk_k2 = self.template._cheb.evaluate_static(
                    stacked, mat[n1:n1 + n2]) * mask[n1:n1 + n2]
                vals2 = self.template._cheb.evaluate_static(
                    stacked, mat, precision=loop_matmul_precision()) * mask
                pknw_rq = self.template._cheb.evaluate_static(coeffs_nw, self._resum_mat)
                sigma2, dsigma2, f0, s2_iso = self._resum_scales(pknw_rq)
                damp_pts = jnp.exp(-jnp.asarray(self._loop_pts2, dtype=coeffs.dtype) * s2_iso)
                vals = vals2[1] + damp_pts * (vals2[0] - vals2[1])
                pk_k = pk_k2[1] + damp_pts[n1:n1 + n2] * (pk_k2[0] - pk_k2[1])
            else:
                pk_k = self.template._cheb.evaluate_static(
                    coeffs, mat[n1:n1 + n2]) * mask[n1:n1 + n2]
                vals = self.template._cheb.evaluate_static(
                    coeffs, mat, precision=loop_matmul_precision()) * mask
            pk_x = vals[:n1]
            pk_kq = vals[n1 + n2:n1 + n2 + n3].reshape(n2, -1)
            t = self.loop.tables_from_arrays(pk_x, pk_k, pk_kq, vals[-n4:])
            pk_lin_w = pk_k
        else:
            lo, hi = self._tmpl_lims
            base_fn = self._pk_fn()
            if resum:
                pknw_rq = self.template.pknow_dd_interp(jnp.asarray(self._resum_q))
                sigma2, dsigma2, f0, s2_iso = self._resum_scales(pknw_rq)
                tmpl = self.template

                def fn(kq):
                    msk = (kq > lo) & (kq < hi)
                    pnw = tmpl.pknow_dd_interp(kq) * msk
                    return pnw + jnp.exp(-kq ** 2 * s2_iso) * (base_fn(kq) - pnw)
            else:
                fn = base_fn
            t = self.loop.tables(fn)
            pk_lin_w = fn(jnp.asarray(self.k_work))
        # assemble on the working grid (McDonald-Roy basis); with resum the
        # linear (tree) term is added at the output stage instead, where its
        # mu-dependent damping + leading-order wiggle correction live
        lin_w = 0. if resum else pk_lin_w
        pgg_dd = (b1 ** 2 * (lin_w + t['p22_dd'] + t['p13_dd'])
                  + 2. * b1 * b2 * t['pb2_d'] + 2. * b1 * bs * t['pbs2_d']
                  + 2. * b1 * b3nl * t['p_sig3sq']
                  + b2 ** 2 * t['pb22'] + 2. * b2 * bs * t['pb2s2'] + bs ** 2 * t['pbs22'])
        pgg_dt = (b1 * (lin_w + t['p22_dt'] + t['p13_dt'])
                  + b2 * t['pb2_t'] + bs * t['pbs2_t'] + b3nl * t['p_sig3sq'])
        p_tt = lin_w + t['p22_tt'] + t['p13_tt']

        jac, kap, muap = self.template.ap_k_mu(self.k, self.mu)
        # scale-dependent under the eh99 engine (neutrino suppression in the
        # RSD combination, as FOLPS feeds fk into its tables); the loop
        # tables themselves use the standard EdS kernels
        f = self.template.f_of_k(kap) if hasattr(self.template, 'f_of_k') else self.template.f
        cheb = self._work_cheb
        dd_ap = cheb.evaluate(cheb.coeffs(pgg_dd), kap)
        dt_ap = cheb.evaluate(cheb.coeffs(pgg_dt), kap)
        tt_ap = cheb.evaluate(cheb.coeffs(p_tt), kap)
        plin_ap = self.template.pk_dd_interp(kap)

        pkmu = jac * (dd_ap + 2. * f * muap ** 2 * dt_ap + f ** 2 * muap ** 4 * tt_ap)
        if resum:
            # tree level, exactly: P_nw + e^{-k^2 Sigma_tot^2(mu)} (1 + k^2
            # Sigma_tot^2(mu)) P_w — the (1 + ...) term cancels the damped
            # tree wiggle double-counted by the loops at one-loop order
            pnw_ap = self.template.pknow_dd_interp(kap)
            pw_ap = plin_ap - pnw_ap
            s2tot = ((1. + f0 * (f0 + 2.) * muap ** 2) * sigma2
                     + f0 ** 2 * muap ** 2 * (muap ** 2 - 1.) * dsigma2)
            damp = jnp.exp(-kap ** 2 * s2tot)
            ptree = pnw_ap + damp * (1. + kap ** 2 * s2tot) * pw_ap
            plin_ct = pnw_ap + damp * pw_ap
            pkmu = pkmu + jac * (b1 + f * muap ** 2) ** 2 * ptree
        else:
            plin_ct = plin_ap
        # EFT counterterms: (ct_l mu^(l) pattern) k^2 P_lin
        mu_pows = {0: 1., 2: muap ** 2, 4: muap ** 4, 6: muap ** 6}
        self._ct_bases = {}
        if self.physical:
            # dimensionless alpha_n with the velocileptors-convention growth/
            # bias combinations (reference full_shape.py:1304-1305): the
            # counterterm P(k,mu) is b1^2 a0 mu^0 + f b1 (a0+a2) mu^2
            # + f (f a2 + b1 a4) mu^4 + f^2 a4 mu^6, all x k^2 P_lin —
            # linear in the alphas given (b1, f), so each still gets an
            # in-primal marginalization basis row
            f0 = self.template.f
            bases = {n: mu_pows[n] * kap ** 2 * plin_ct * jac for n in (0, 2, 4, 6)}
            rows = {'alpha0p': b1 ** 2 * bases[0] + f0 * b1 * bases[2],
                    'alpha2p': f0 * b1 * bases[2] + f0 ** 2 * bases[4],
                    'alpha4p': f0 * b1 * bases[4] + f0 ** 2 * bases[6]}
            for name, row in rows.items():
                self._ct_bases[name] = self.to_poles(jnp.broadcast_to(row, pkmu.shape))
                pkmu = pkmu + params.get(name, 0.) * row
            # stochastic: SN_n x fsat sigv^n, shot-noise units (ref :1307)
            sn2 = params.get('sn2p', 0.) * self.fsat * self.sigv ** 2
            sn4 = params.get('sn4p', 0.) * self.fsat * self.sigv ** 4
        else:
            for name in self.ct_names:
                ell = self.ct_ells[name]
                ct = params.get(name, 0.)
                basis_mu = mu_pows[ell] * kap ** 2 * plin_ct * jac
                self._ct_bases[name] = self.to_poles(jnp.broadcast_to(basis_mu, pkmu.shape))
                pkmu = pkmu + ct * basis_mu
            sn2 = params.get('sn2_2', 0.)
            sn4 = params.get('sn4_2', 0.)
        # stochastic terms
        k_ = self.k[:, None]
        k2mu2 = k_ ** 2 * self.mu ** 2
        pkmu = pkmu + (sn0 + sn2 * k2mu2 + sn4 * k2mu2 ** 2) / self.nd
        self.power = self.to_poles(pkmu)
        # linear poles for diagnostics / pk11 consumers
        self.pktable = {'pk11': self.to_poles(jnp.broadcast_to(plin_ct, pkmu.shape))}

    def solved_power_basis(self, basename):
        return self._ct_bases[basename]

    @property
    def z(self):
        return self.template.z

    def get(self):
        return self.power


class EPTTracerCorrelationFunctionMultipoles(BaseTracerCorrelationFunctionMultipoles):
    """1-loop EPT tracer xi_l(s) via FFTLog of the pk model."""

    _power_cls = EPTTracerPowerSpectrumMultipoles
