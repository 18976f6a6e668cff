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
    def _cheb_interp(self, name, k):
        values = getattr(self, name)
        cached = self._cheb_cache.get(name)
        if cached is None or cached[0] is not values:
            cached = (values, self._cheb.coeffs(jnp.asarray(values)))
            self._cheb_cache[name] = cached
        return self._cheb.evaluate(cached[1], k)

    def pk_dd_interp(self, k):
        return self._cheb_interp('pk_dd', k)

    def pknow_dd_interp(self, k):
        return self._cheb_interp('pknow_dd', k)

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
                   only_now=False, eta=1. / 3., varied=('h', 'omega_cdm', 'omega_b', 'logA', 'n_s')):
        self.cosmo = Cosmology(fiducial=fiducial if isinstance(fiducial, dict) else None)
        for name in varied:
            self.cosmo.init.params.set(_direct_param(name))
        # the AP effect shares this cosmology node (passed via init so it
        # survives re-initialization)
        super().initialize(k=k, z=z, fiducial=fiducial, apmode='geometry',
                           with_now=with_now, only_now=only_now, eta=eta, cosmo=self.cosmo)
        if self.with_now:
            self._filter = lin.NoWiggleFilter(self.k)

    def calculate(self, **params):
        p = self.cosmo.p
        self.pk_dd = lin.pk_lin(p, self.k, self.z)
        self.f = bg.growth_rate(p, self.z)
        self.f0 = self.f
        self.fk = jnp.full(self.k.shape, self.f)
        self.sigma8 = lin.sigma_r(p, 8., self.z)
        self.fsigma8 = self.f * self.sigma8
        if self.with_now:
            pknw_shape = lin.pk_lin(p, self.k, self.z, nowiggle=True)
            self.pknow_dd = self._filter(self.pk_dd, pknw_shape)
        if self.only_now:
            self.pk_dd = self.pknow_dd


def _direct_param(name):
    from .cosmology import _COSMO_PARAM_DEFAULTS
    from ..parameters import Parameter
    cfg = dict(_COSMO_PARAM_DEFAULTS[name])
    cfg['fixed'] = False
    return Parameter(basename=name, **cfg)
