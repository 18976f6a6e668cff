"""Linear power spectrum templates and extractors.

Counterpart of reference theories/galaxy_clustering/power_template.py:
parameterizations of the linear pk around a fiducial cosmology. Fiducial
tables are precomputed host-side at initialize; per-evaluation modifications
(ShapeFit tilt, BAO scaling, growth rescaling) are pure traced ops.
"""

import numpy as np
import jax.numpy as jnp

from ..core import Calculator
from ..cosmology import background as bg
from ..cosmology import linear as lin
from ..ops.interp import interp1d
from .base import APEffect
from .cosmology import Cosmology


def loglog_interp(template_k_log10, values, k):
    """Cubic interpolation of a pk table vs log10 k (reference bao.py:18)."""
    return interp1d(jnp.log10(k), template_k_log10, values, method='cubic')


_Q_PARAM = dict(value=1., prior=dict(limits=[0.8, 1.2]), ref=dict(limits=[0.99, 1.01]), delta=0.008)


class BasePowerSpectrumTemplate(Calculator):
    """Base template: fiducial linear pk tables + AP parameterization.

    Parameters: depends on ``apmode`` (qpar/qper/qiso/qap); subclasses add
    shape/growth parameters. Exposes (as attributes after calculate):
    k, pk_dd, pknow_dd, f, f0, fk, sigma8, fsigma8, qpar, qper, and
    fiducial ``*_fid`` twins.
    """

    _state_attrs = ['pk_dd', 'pknow_dd', 'f', 'fsigma8', 'qpar', 'qper']

    def initialize(self, k=None, z=1., fiducial=None, apmode='qparqper',
                   with_now='peakaverage', only_now=False, eta=1. / 3., cosmo=None):
        if k is None:
            k = np.logspace(-3., 1., 400)
        self.k = np.asarray(k, dtype='f8')
        self.z = float(np.asarray(z))
        self.fiducial = bg.resolve(fiducial if isinstance(fiducial, dict) else None)
        self.only_now = bool(only_now)
        self.with_now = with_now or (only_now and 'peakaverage')
        self.apeffect = APEffect(z=self.z, mode=apmode, eta=eta, cosmo=cosmo,
                                 fiducial=fiducial if isinstance(fiducial, dict) else None)
        self._set_fiducial()

    def _set_fiducial(self):
        """Host-side fiducial tables."""
        p = self.fiducial
        self.pk_dd_fid = np.asarray(lin.pk_lin(p, self.k, self.z), dtype='f8')
        self.f_fid = float(bg.growth_rate(p, self.z))
        self.sigma8_fid = float(lin.sigma_r(p, 8., self.z))
        self.fsigma8_fid = self.f_fid * self.sigma8_fid
        # scale-independent growth: fk = f everywhere, f0 = f
        self.f0_fid = self.f_fid
        self.fk_fid = np.full_like(self.pk_dd_fid, self.f_fid)
        if self.with_now:
            filt = lin.NoWiggleFilter(self.k)
            pknw_shape = np.asarray(lin.pk_lin(p, self.k, self.z, nowiggle=True), dtype='f8')
            self.pknow_dd_fid = np.asarray(filt(jnp.asarray(self.pk_dd_fid), jnp.asarray(pknw_shape)), dtype='f8')
        self.rs_drag_fid = float(bg.rs_drag(p))
        self._logk = np.log10(self.k)
        # Chebyshev spectral table: gather-free interpolation on TPU
        # (see ops/chebyshev.py for the rationale and measured speedups)
        from ..ops.chebyshev import ChebyshevLogInterp
        self._cheb = ChebyshevLogInterp(self.k)
        self._cheb_cache = {}

    def calculate(self, **params):
        for name in ['pk_dd', 'f', 'f0', 'fk', 'sigma8', 'fsigma8']:
            setattr(self, name, getattr(self, name + '_fid'))
        if self.with_now:
            self.pknow_dd = self.pknow_dd_fid
        if self.only_now:
            self.pk_dd = self.pknow_dd

    # interpolation helpers used by theory models (Chebyshev spectral tables;
    # coefficients cached by table identity within a trace)
    def _cheb_coeffs(self, name):
        values = getattr(self, name)
        cached = self._cheb_cache.get(name)
        if cached is None or cached[0] is not values:
            cached = (values, self._cheb.coeffs(jnp.asarray(values)))
            self._cheb_cache[name] = cached
        return cached[1]

    def _cheb_interp(self, name, k):
        return self._cheb.evaluate(self._cheb_coeffs(name), k)

    def pk_dd_coeffs(self):
        """Chebyshev coefficients of the current pk_dd (cached per trace) —
        pair with ``self._cheb.evaluate_static`` for static-grid consumers."""
        return self._cheb_coeffs('pk_dd')

    def pk_dd_interp(self, k):
        return self._cheb_interp('pk_dd', k)

    def f_of_k(self, k):
        """Growth rate at (AP-remapped) k: the scalar f unless the cosmology
        engine provides a genuinely scale-dependent fk (eh99 neutrino
        free-streaming) — a static branch, so non-eh99 hot paths pay
        nothing (reference full_shape.py:1463-1475 fk-table analog)."""
        if getattr(getattr(self, 'cosmo', None), 'engine', None) == 'eh99':
            return self._cheb_interp('fk', k)
        return self.f

    def pknow_dd_interp(self, k):
        return self._cheb_interp('pknow_dd', k)

    def pknow_dd_coeffs(self):
        """Chebyshev coefficients of the current no-wiggle pk (cached per
        trace) — the wiggle/no-wiggle split consumed by IR resummation."""
        return self._cheb_coeffs('pknow_dd')

    @property
    def qpar(self):
        return self.apeffect.qpar

    @property
    def qper(self):
        return self.apeffect.qper

    def ap_k_mu(self, k, mu):
        # via self.qpar/self.qper (not the apeffect node) so that emulated
        # templates, which store qpar/qper as plain state, keep working
        from .base import ap_k_mu
        return ap_k_mu(k, mu, qpar=self.qpar, qper=self.qper)

    def ap_s_mu(self, s, mu):
        from .base import ap_s_mu
        return ap_s_mu(s, mu, qpar=self.qpar, qper=self.qper)


class FixedPowerSpectrumTemplate(BasePowerSpectrumTemplate):
    """Fixed fiducial template, no varied parameters (reference :175)."""

    def initialize(self, **kwargs):
        kwargs.setdefault('apmode', 'qparqper')
        super().initialize(**kwargs)
        # fix AP parameters: pure fiducial template
        self.apeffect.init.params = {'qpar': dict(value=1., fixed=True),
                                     'qper': dict(value=1., fixed=True)}
        self.apeffect.runtime_info.initialized = False


class BAOPowerSpectrumTemplate(BasePowerSpectrumTemplate):
    """BAO template: AP scaling parameters + optional growth rescaling df
    (reference :339). Exposes derived DH_over_rd, DM_over_rd, DV_over_rd,
    DH_over_DM."""

    @staticmethod
    def _params(init):
        params = {'df': dict(value=1., prior=dict(limits=[0., 2.]), ref=dict(limits=[0.95, 1.05]),
                             delta=0.02, latex='df', fixed=init.get('df_fixed', True))}
        for name in ['DH_over_rd', 'DM_over_rd', 'DV_over_rd', 'DH_over_DM']:
            params[name] = dict(derived=True, latex=name.replace('_over_', '/'))
        return params

    def initialize(self, with_now='peakaverage', **kwargs):
        kwargs.setdefault('apmode', 'qparqper')
        super().initialize(with_now=with_now, **kwargs)
        # fiducial distances over rs_drag (BAOExtractor._set_base analog)
        p = self.fiducial
        DH = float(bg.hubble_distance(p, self.z))
        DM = float(bg.comoving_angular_distance(p, self.z))
        DV = (DH * DM ** 2 * self.z) ** (1. / 3.) if self.z > 0 else DH
        rd = self.rs_drag_fid
        self.DH_over_rd_fid = DH / rd
        self.DM_over_rd_fid = DM / rd
        self.DV_over_rd_fid = DV / rd
        self.DH_over_DM_fid = DH / DM

    def calculate(self, df=1., **params):
        super().calculate(**params)
        self.f = self.f_fid * df
        self.f0 = self.f0_fid * df
        self.fk = self.fk_fid * df
        self.fsigma8 = self.fsigma8_fid * df
        eta = self.apeffect.eta
        self.DH_over_rd = self.qpar * self.DH_over_rd_fid
        self.DM_over_rd = self.qper * self.DM_over_rd_fid
        self.DV_over_rd = self.qpar ** eta * self.qper ** (1. - eta) * self.DV_over_rd_fid
        self.DH_over_DM = self.qpar / self.qper * self.DH_over_DM_fid


class BAOPhaseShiftPowerSpectrumTemplate(BAOPowerSpectrumTemplate):
    r"""BAO template with the N_eff-induced phase shift of the wiggles
    (reference power_template.py:442; Baumann et al. 2018, arXiv:1803.10741):
    wiggles are evaluated at k + (baoshift - 1) * f_shift(k) with
    f_shift = phi_inf / (1 + (k*/k)^eps) / rd."""

    @staticmethod
    def _params(init):
        params = dict(BAOPowerSpectrumTemplate._params(init))
        params['baoshift'] = dict(value=1., prior=dict(limits=[-2., 4.]),
                                  ref=dict(dist='norm', loc=1., scale=0.1), latex=r'eta_\phi')
        return params

    def initialize(self, phiinf=0.227, kstar=0.0324, epsilon=0.872, **kwargs):
        self.phiinf = float(phiinf)
        self.kstar = float(kstar)
        self.epsilon = float(epsilon)
        super().initialize(**kwargs)
        from ..ops.chebyshev import ChebyshevLogInterp
        self._wigphase_cheb = ChebyshevLogInterp(self.k, log_values=False)
        self._wigphase_coeffs = self._wigphase_cheb.coeffs(
            jnp.asarray(self.pk_dd_fid - self.pknow_dd_fid))

    def calculate(self, df=1., baoshift=1., **params):
        super().calculate(df=df, **params)
        kshift = self.phiinf / (1. + (self.kstar / jnp.asarray(self.k)) ** self.epsilon) / self.rs_drag_fid
        kq = jnp.clip(jnp.asarray(self.k) + (baoshift - 1.) * kshift, self.k[0], self.k[-1])
        wiggles = self._wigphase_cheb.evaluate(self._wigphase_coeffs, kq)
        self.pk_dd = jnp.asarray(self.pknow_dd_fid) + wiggles
        if self.only_now:
            self.pk_dd = self.pknow_dd


class StandardPowerSpectrumTemplate(BasePowerSpectrumTemplate):
    """Standard RSD template: qpar/qper + df (reference :553)."""

    @staticmethod
    def _params(init):
        return {'df': dict(value=1., prior=dict(limits=[0., 2.]), ref=dict(limits=[0.95, 1.05]),
                           delta=0.02, latex='df')}

    def initialize(self, **kwargs):
        kwargs.setdefault('apmode', 'qparqper')
        super().initialize(**kwargs)

    def calculate(self, df=1., **params):
        super().calculate(**params)
        self.f = self.f_fid * df
        self.f0 = self.f0_fid * df
        self.fk = self.fk_fid * df
        self.fsigma8 = self.fsigma8_fid * df


class ShapeFitPowerSpectrumTemplate(BasePowerSpectrumTemplate):
    r"""ShapeFit template (Brieden et al. 2021, arXiv:2106.07641; reference :697).

    pk = pk_fid * exp(dm/a * tanh(a ln(k/kp)) + dn * ln(k/kp)), growth
    rescaled by df (normalized to f sqrt(Ap) at the pivot).
    """

    @staticmethod
    def _params(init):
        return {
            'df': dict(value=1., prior=dict(limits=[0., 2.]), ref=dict(limits=[0.95, 1.05]), delta=0.02, latex='df'),
            'dm': dict(value=0., prior=dict(limits=[-3., 3.]), ref=dict(limits=[-0.01, 0.01]), delta=0.01, latex='dm'),
            'dn': dict(value=0., fixed=True, prior=dict(limits=[-0.5, 0.5]), ref=dict(dist='norm', loc=0., scale=0.1), latex='dn'),
            'f_sqrt_Ap': dict(derived=True, latex=r'f A_p^{1/2}'),
            'm': dict(derived=True, latex='m'),
            'n': dict(derived=True, latex='n'),
        }

    def initialize(self, kp=0.03, a=0.6, **kwargs):
        self.kp_shape = float(kp)
        self.a_shape = float(a)
        kwargs.setdefault('apmode', 'qparqper')
        kwargs.setdefault('with_now', 'peakaverage')
        super().initialize(**kwargs)
        # fiducial amplitude at pivot: Ap = pknow(kp) (eq. 3.11, arXiv:2106.07641)
        self.Ap_fid = float(np.interp(self.kp_shape, self.k, self.pknow_dd_fid))
        self.n_fid = float(self.fiducial['n_s'])
        # fiducial slope m at pivot from the no-wiggle pk
        dk = 1e-2
        kk = self.kp_shape * np.array([1. - dk, 1. + dk])
        pknw = np.interp(kk, self.k, self.pknow_dd_fid)
        self.m_fid = float(np.diff(np.log(pknw))[0] / np.diff(np.log(kk))[0])

    def calculate(self, df=1., dm=0., dn=0., **params):
        super().calculate(**params)
        lnkkp = jnp.log(self.k / self.kp_shape)
        factor = jnp.exp(dm / self.a_shape * jnp.tanh(self.a_shape * lnkkp) + dn * lnkkp)
        self.pk_dd = self.pk_dd_fid * factor
        if self.with_now:
            self.pknow_dd = self.pknow_dd_fid * factor
        if self.only_now:
            self.pk_dd = self.pknow_dd
        self.n = self.n_fid + dn
        self.m = self.m_fid + dm
        self.f = self.f_fid * df
        self.f0 = self.f0_fid * df
        self.fk = self.fk_fid * df
        self.fsigma8 = self.fsigma8_fid * df
        self.f_sqrt_Ap = self.f * self.Ap_fid ** 0.5


class DirectPowerSpectrumTemplate(BasePowerSpectrumTemplate):
    """Direct template: base cosmological parameters + geometric AP
    (reference :205). Fully differentiable through the EH98 backend."""

    def initialize(self, k=None, z=1., fiducial=None, with_now='peakaverage',
                   only_now=False, eta=1. / 3., varied=('h', 'omega_cdm', 'omega_b', 'logA', 'n_s'),
                   engine='eh98', pk_table=None, emulator=None, cosmo=None):
        if cosmo is not None:
            self.cosmo = cosmo
            engine = cosmo.init.get('engine', engine)
        else:
            self.cosmo = Cosmology(fiducial=fiducial if isinstance(fiducial, dict) else None,
                                   engine=engine, pk_table=pk_table, emulator=emulator)
        if engine != 'external':
            # external mode: the HOST code varies the cosmology and injects
            # its products (reference bindings/base.py cosmo_requires flow)
            for name in varied:
                self.cosmo.init.params.set(_direct_param(name))
        # the AP effect shares this cosmology node (passed via init so it
        # survives re-initialization)
        super().initialize(k=k, z=z, fiducial=fiducial, apmode='geometry',
                           with_now=with_now, only_now=only_now, eta=eta, cosmo=self.cosmo)
        if self.with_now:
            self._filter = lin.NoWiggleFilter(self.k)

    def calculate(self, **params):
        self.pk_dd = self.cosmo.pk_dd(self.k, self.z)
        self.f = self.cosmo.growth_rate(self.z)
        self.f0 = self.f
        # flat except the eh99 engine (neutrino-suppressed growth rate)
        self.fk = self.cosmo.growth_rate_k(self.k, self.z) \
            if hasattr(self.cosmo, 'growth_rate_k') else jnp.full(self.k.shape, self.f)
        self.sigma8 = self.cosmo.sigma_r(8., self.z)
        self.fsigma8 = self.f * self.sigma8
        if self.with_now:
            pknw_shape = self.cosmo.pk_dd_now(self.k, self.z)
            self.pknow_dd = self._filter(self.pk_dd, pknw_shape)
        if self.only_now:
            self.pk_dd = self.pknow_dd


def _direct_param(name):
    from .cosmology import _COSMO_PARAM_DEFAULTS
    from ..parameters import Parameter
    cfg = dict(_COSMO_PARAM_DEFAULTS[name])
    cfg['fixed'] = False
    return Parameter(basename=name, **cfg)


def _sigma_r2_grid(k, pk, r, kernel='gauss'):
    """sigma_r^2 = 1/(2 pi^2) int k^2 P(k) K(kr) dk on the (static) k grid."""
    k = jnp.asarray(k)
    if kernel == 'gauss':
        w = jnp.exp(-(k * r) ** 2)
    elif kernel == 'tophat':
        from ..cosmology.linear import tophat_window
        w = tophat_window(k * r) ** 2
    else:
        raise ValueError(kernel)
    from ..ops.legendre import trapz_weights
    wk = jnp.asarray(trapz_weights(np.asarray(k)))
    return jnp.sum(wk * k ** 2 * pk * w) / (2. * np.pi ** 2)


class WiggleSplitPowerSpectrumTemplate(BasePowerSpectrumTemplate):
    r"""Wiggle-split template (reference power_template.py:1150): the BAO
    wiggles move with qbao independently of the broadband; dm tilts the
    broadband as (k/0.05)^dm; the amplitude is re-normalized so that
    fsigma_r scales exactly with df. AP mode 'qap' (isotropic dilation is
    degenerate with qbao here)."""

    @staticmethod
    def _params(init):
        return {
            'df': dict(value=1., prior=dict(limits=[0., 2.]), ref=dict(limits=[0.95, 1.05]), delta=0.02, latex='df'),
            'dm': dict(value=0., prior=dict(limits=[-3., 3.]), ref=dict(limits=[-0.01, 0.01]), delta=0.01, latex='dm'),
            'qbao': dict(value=1., prior=dict(limits=[0.8, 1.2]), ref=dict(limits=[0.99, 1.01]), delta=0.008, latex=r'q_{\rm BAO}'),
            'r': dict(derived=True, latex='r'),
        }

    def initialize(self, r=8., kernel='gauss', **kwargs):
        self.r = float(r)
        self.kernel = str(kernel)
        kwargs.setdefault('apmode', 'qap')
        kwargs.setdefault('with_now', 'peakaverage')
        super().initialize(**kwargs)
        from ..ops.chebyshev import ChebyshevLogInterp
        self._wiggle_cheb = ChebyshevLogInterp(self.k, log_values=False)
        self._wiggle_coeffs = self._wiggle_cheb.coeffs(
            jnp.asarray(self.pk_dd_fid - self.pknow_dd_fid))
        self.fsigmar_fid = self.f_fid * float(np.sqrt(np.asarray(
            _sigma_r2_grid(self.k, jnp.asarray(self.pk_dd_fid), self.r, self.kernel))))

    def calculate(self, df=1., dm=0., **params):
        super().calculate(**params)
        kp = 0.05
        factor = (jnp.asarray(self.k) / kp) ** dm
        qbao = params.get('qbao', 1.)
        wig = self._wiggle_cheb.evaluate(self._wiggle_coeffs, jnp.asarray(self.k) / qbao)
        pk_unnorm = (jnp.asarray(self.pknow_dd_fid) + wig) * factor
        pknow_unnorm = jnp.asarray(self.pknow_dd_fid) * factor
        self.f = self.f_fid * df
        self.f0 = self.f0_fid * df
        self.fk = self.fk_fid * df
        # normalize: fsigma_r = df * fsigmar_fid exactly
        norm = (df * self.fsigmar_fid / self.f) ** 2 / _sigma_r2_grid(self.k, pk_unnorm, self.r, self.kernel)
        self.pk_dd = pk_unnorm * norm
        self.pknow_dd = pknow_unnorm * norm
        if self.only_now:
            self.pk_dd = self.pknow_dd
        self.m = dm


class BandVelocityPowerSpectrumTemplate(BasePowerSpectrumTemplate):
    r"""Band-power template (reference power_template.py:870): the velocity
    power spectrum is scaled by free band amplitudes dptt{i} at pivots kp,
    linearly interpolated between bands (flat beyond the end bands), with
    qap anisotropic scaling and growth rescaling df."""

    @staticmethod
    def _params(init):
        kp = init.get('kp', None)
        n = len(kp) if kp is not None else 0
        params = {
            'df': dict(value=1., prior=dict(limits=[0., 2.]), ref=dict(limits=[0.95, 1.05]), delta=0.02, latex='df'),
        }
        for i in range(n):
            params['dptt{:d}'.format(i)] = dict(
                value=1., prior=dict(limits=[0., 3.]), ref=dict(limits=[0.99, 1.01]),
                delta=0.01, latex=r'\Delta P_{{\theta\theta,{:d}}}'.format(i))
        return params

    def initialize(self, kp=None, **kwargs):
        if kp is None:
            raise ValueError('provide band pivots kp')
        self.kp = np.asarray(kp, dtype='f8')
        kwargs.setdefault('apmode', 'qap')
        super().initialize(**kwargs)
        # partition-of-unity hat basis over log k, flat at the ends
        lkp = np.log(self.kp)
        lk = np.log(self.k)
        basis = np.zeros((len(self.kp), len(self.k)))
        for i in range(len(self.kp)):
            lo = lkp[i - 1] if i > 0 else -np.inf
            hi = lkp[i + 1] if i < len(self.kp) - 1 else np.inf
            up = np.clip((lk - lo) / (lkp[i] - lo), 0., 1.) if np.isfinite(lo) else np.ones_like(lk)
            down = np.clip((hi - lk) / (hi - lkp[i]), 0., 1.) if np.isfinite(hi) else np.ones_like(lk)
            basis[i] = np.minimum(up, down)
        self._band_basis = basis

    def calculate(self, df=1., **params):
        super().calculate()
        n = len(self.kp)
        amps = jnp.stack([jnp.asarray(params.get('dptt{:d}'.format(i), 1.)) for i in range(n)])
        scale = jnp.einsum('i,ik->k', amps, jnp.asarray(self._band_basis)) \
            + (1. - jnp.einsum('i,ik->k', jnp.ones(n), jnp.asarray(self._band_basis)))
        self.pk_dd = self.pk_dd_fid * scale
        if self.with_now:
            self.pknow_dd = self.pknow_dd_fid * scale
        self.f = self.f_fid * df
        self.f0 = self.f0_fid * df
        self.fk = self.fk_fid * df
        self.pk_tt = self.f ** 2 * self.pk_dd


class TurnOverPowerSpectrumTemplate(BasePowerSpectrumTemplate):
    r"""Turn-over template (reference power_template.py:1298; arXiv:2302.07484):
    the spectrum is the PARAMETRIC form of that paper,

        P(k) = P_TO^{1 - m x^2} (k above the turn-over),
               P_TO^{1 - n x^2} (below),   x = log10(k)/log10(k_TO) - 1,

    with free shape exponents m, n, turn-over scale k_TO = qto * k_TO^fid
    and height P_TO = dpto * P_TO^fid; derived DV_times_kTO and DH_over_DM
    track the AP dilation."""

    @staticmethod
    def _params(init):
        return {
            'm': dict(value=0.57, prior=dict(limits=[-1., 10.]), ref=dict(limits=[0., 1.]), delta=0.01, latex='m'),
            'n': dict(value=0.89, prior=dict(limits=[0., 10.]), ref=dict(limits=[0.5, 1.]), delta=0.01, latex='n'),
            'qto': dict(value=1., prior=dict(limits=[0.5, 1.5]), ref=dict(limits=[0.99, 1.01]), delta=0.008, latex=r'q_{\rm TO}'),
            'dpto': dict(value=1., fixed=True, prior=dict(limits=[0., 2.]), ref=dict(limits=[0.9, 1.1]), delta=0.01, latex=r'(P/P^{\rm fid})(k_{\rm TO})'),
            'df': dict(value=1., fixed=True, prior=dict(limits=[0., 2.]), ref=dict(limits=[0.95, 1.05]), latex='df'),
            'DV_times_kTO': dict(derived=True, latex=r'D_V k_{\rm TO}'),
            'DH_over_DM': dict(derived=True, latex=r'D_H/D_M'),
        }

    def initialize(self, **kwargs):
        kwargs.setdefault('apmode', 'qap')
        kwargs.setdefault('with_now', False)
        super().initialize(**kwargs)
        # fiducial turn-over: parabolic interpolation of the log-log maximum
        pk = np.asarray(self.pk_dd_fid)
        imax = int(np.argmax(pk))
        lk = np.log10(self.k[imax - 1:imax + 2])
        lp = np.log10(pk[imax - 1:imax + 2])
        denom = (lk[0] - lk[1]) * (lk[0] - lk[2])
        c0 = lp[0] / denom
        c1 = lp[1] / ((lk[1] - lk[0]) * (lk[1] - lk[2]))
        c2 = lp[2] / ((lk[2] - lk[0]) * (lk[2] - lk[1]))
        a = c0 + c1 + c2
        lk0 = (c0 * (lk[1] + lk[2]) + c1 * (lk[0] + lk[2]) + c2 * (lk[0] + lk[1])) / (2. * a)
        self.kto_fid = 10. ** lk0
        # height of the parabola at the maximum
        self.pkto_fid = 10. ** float(lp[1] - a * (lk[1] - lk0) ** 2) \
            if np.isfinite(a) else float(pk[imax])
        p = self.fiducial
        DH = float(bg.hubble_distance(p, self.z))
        DM = float(bg.comoving_angular_distance(p, self.z))
        self.DV_fid = (DH * DM ** 2 * self.z) ** (1. / 3.) if self.z > 0 else DH
        self.DH_over_DM_fid = DH / DM
        self.DV_times_kTO_fid = self.DV_fid * self.kto_fid

    def calculate(self, df=1., m=0.57, n=0.89, qto=1., dpto=1., **params):
        super().calculate()
        kto = self.kto_fid * qto
        pkto = self.pkto_fid * dpto
        x = jnp.log10(jnp.asarray(self.k)) / jnp.log10(kto) - 1.
        # published two-branch form (ref power_template.py:1327-1336)
        self.pk_dd = jnp.where(x > 0, pkto ** (1. - m * x ** 2), pkto ** (1. - n * x ** 2))
        self.pknow_dd = self.pk_dd
        self.f = self.f_fid * df
        self.f0 = self.f0_fid * df
        self.fk = self.fk_fid * df
        self.kto = kto
        qiso = (self.qpar * self.qper ** 2) ** (1. / 3.)
        qap = self.qpar / self.qper
        self.DV_times_kTO = qiso * self.DV_times_kTO_fid
        self.DH_over_DM = qap * self.DH_over_DM_fid


class DirectWiggleSplitPowerSpectrumTemplate(DirectPowerSpectrumTemplate):
    r"""Direct template with the wiggly part dilated by qbao and damped by
    sigmabao (reference power_template.py:1346; arXiv:2112.10749) — base
    cosmological parameters while marginalizing over the sound-horizon
    scale."""

    @staticmethod
    def _params(init):
        return {
            'qbao': dict(value=1., prior=dict(limits=[0.8, 1.2]), ref=dict(limits=[0.99, 1.01]),
                         delta=0.008, latex=r'q_{\rm BAO}'),
            'sigmabao': dict(value=0., prior=dict(limits=[0., 20.]), ref=dict(limits=[0., 1.]),
                             latex=r'\Sigma_{\rm BAO}'),
        }

    def initialize(self, **kwargs):
        kwargs.setdefault('with_now', 'peakaverage')
        super().initialize(**kwargs)
        from ..ops.chebyshev import ChebyshevLogInterp
        self._wiggle_cheb = ChebyshevLogInterp(self.k, log_values=False)

    def calculate(self, qbao=1., sigmabao=0., **params):
        super().calculate(**params)
        wiggles = self.pk_dd - self.pknow_dd
        coeffs = self._wiggle_cheb.coeffs(wiggles)
        moved = self._wiggle_cheb.evaluate(coeffs, jnp.asarray(self.k) / qbao)
        moved = moved * jnp.exp(-(jnp.asarray(self.k) * sigmabao) ** 2)
        self.pk_dd = self.pknow_dd + moved
        if self.only_now:
            self.pk_dd = self.pknow_dd


class ExtractedBandVelocityPowerSpectrumTemplate(BandVelocityPowerSpectrumTemplate):
    r"""Band-power template whose band amplitudes dptt{i}, growth df and AP
    qap are COMPUTED by a :class:`BandVelocityPowerSpectrumExtractor` running
    on a direct cosmology, instead of being sampled.  Building block of
    :func:`BandVelocityPowerSpectrumCalculator` (reference
    power_template.py:826)."""

    @staticmethod
    def _params(init):
        return {}

    def initialize(self, extractor=None, kp=None, eta=1. / 3., cosmo=None,
                   fiducial=None, **kwargs):
        if extractor is None:
            from .extractors import BandVelocityPowerSpectrumExtractor
            extractor = BandVelocityPowerSpectrumExtractor(
                kp=kp, z=kwargs.get('z', 1.), eta=eta, cosmo=cosmo, fiducial=fiducial)
        self.extractor = extractor
        self.eta = float(eta)
        kwargs.setdefault('apmode', 'qap')
        super().initialize(kp=kp, fiducial=fiducial, eta=eta, **kwargs)
        # AP comes from the extractor, not a sampled qap
        self.apeffect.init.params = {'qap': dict(value=1., fixed=True)}
        self.apeffect.runtime_info.initialized = False

    @property
    def qpar(self):
        return self.extractor.qap ** (1. - self.eta)

    @property
    def qper(self):
        return self.extractor.qap ** (-self.eta)

    def calculate(self, **params):
        BasePowerSpectrumTemplate.calculate(self)
        ex = self.extractor
        n = len(self.kp)
        amps = jnp.asarray(ex.dptt)
        basis = jnp.asarray(self._band_basis)
        scale = jnp.einsum('i,ik->k', amps, basis) \
            + (1. - jnp.einsum('i,ik->k', jnp.ones(n), basis))
        self.pk_dd = self.pk_dd_fid * scale
        if self.with_now:
            self.pknow_dd = self.pknow_dd_fid * scale
        self.f = self.f_fid * ex.df
        self.f0 = self.f0_fid * ex.df
        self.fk = self.fk_fid * ex.df
        self.fsigma8 = self.fsigma8_fid * ex.df
        self.pk_tt = self.f ** 2 * self.pk_dd


def BandVelocityPowerSpectrumCalculator(calculator=None, extractor=None, **kwargs):
    r"""Rewire ``calculator`` (a tracer theory built on
    :class:`BandVelocityPowerSpectrumTemplate`) so its band amplitudes,
    growth and AP distortion are computed from a direct cosmology by a
    :class:`BandVelocityPowerSpectrumExtractor` — turning the band-power
    compression model back into a direct-cosmology predictor (counterpart
    of reference power_template.py:826, built by template swap rather than
    runtime class surgery).  Returns the same calculator instance.  Pass
    ``cosmo=Cosmology(fixed=False)`` to vary the cosmology (the default
    direct cosmology is fixed at the fiducial, as everywhere else)."""
    calculator.runtime_info.initialize()
    template = calculator.template
    new_template = ExtractedBandVelocityPowerSpectrumTemplate(
        extractor=extractor, kp=template.kp, z=template.z, **kwargs)
    calculator.init.update(template=new_template)
    return calculator
