"""BAO theory models: damped wiggles + broadband, pk and xi.

Counterpart of reference theories/galaxy_clustering/bao.py. The per-eval path
is: AP-remap (k, mu) -> interpolate fiducial pk / pknow tables -> damped
wiggle combination -> Legendre projection (one einsum) -> broadband matrix
dot. Everything fuses into one XLA program; the broadband term is exactly
linear in its parameters (the structure analytic marginalization exploits).
"""

import re

import numpy as np
import jax.numpy as jnp

from ..core import Calculator
from ..ops.interp import interp1d
from .base import (BaseTheoryPowerSpectrumMultipoles, WedgesMixin,
                   BaseTheoryCorrelationFunctionFromPowerSpectrumMultipoles)
from .power_template import BAOPowerSpectrumTemplate


def _kernel_func(x, kernel='tsc'):
    """Particle-assignment kernel shapes used as spline broadband bases
    (reference bao.py:44-66)."""
    x = np.abs(np.asarray(x, dtype='f8'))
    out = np.zeros_like(x)
    if kernel == 'ngp':
        out[x < 0.5] = 1.
    elif kernel == 'cic':
        m = x < 1.
        out[m] = 1. - x[m]
    elif kernel == 'tsc':
        m = x < 0.5
        out[m] = 0.75 - x[m] ** 2
        m = (x >= 0.5) & (x < 1.5)
        out[m] = 0.5 * (1.5 - x[m]) ** 2
    elif kernel == 'pcs':
        m = x < 1.
        out[m] = (4. - 6. * x[m] ** 2 + 3. * x[m] ** 3) / 6.
        m = (x >= 1.) & (x < 2.)
        out[m] = (2. - x[m]) ** 3 / 6.
    else:
        raise ValueError('unknown kernel {}'.format(kernel))
    return out


class BaseBAOWigglesPowerSpectrumMultipoles(BaseTheoryPowerSpectrumMultipoles, WedgesMixin):
    """BAO P_l(k) without broadband (reference bao.py:70)."""

    _klim = (1e-4, 1., 2000)

    def initialize(self, k=None, ells=(0, 2), template=None, mode='', smoothing_radius=15.,
                   mu=10, method='leggauss', model='standard', **kwargs):
        super().initialize(k=k, ells=ells)
        self.mode = str(mode)
        if self.mode not in ('', 'recsym', 'reciso'):
            raise ValueError('reconstruction mode must be one of "", "recsym", "reciso"')
        self.smoothing_radius = float(smoothing_radius)
        self.model = str(model)
        if template is None:
            template = BAOPowerSpectrumTemplate()
        self.template = template
        kin = np.geomspace(min(self._klim[0], self.k[0] / 2), max(self._klim[1], self.k[-1] * 2), self._klim[2])
        self.template.init.update(k=kin)
        self.set_k_mu(k=self.k, mu=mu, method=method, ells=self.ells)

    @property
    def z(self):
        return self.template.z

    @property
    def rs_drag_fid(self):
        return self.template.rs_drag_fid


class DampedBAOWigglesPowerSpectrumMultipoles(BaseBAOWigglesPowerSpectrumMultipoles):
    r"""Damped BAO wiggles P_l(k) (reference bao.py:99; BOSS DR12 Beutler et
    al. 2017 style, arXiv:1607.03149).

    Every variant is assembled from four named factors, each evaluated at
    either the observed coordinates (k, mu) or the AP-dilated ones (k', mu'):

    - ``Kaiser(k, mu)`` = (b1 + f mu^2 (1 - S(k)))^2, the linear RSD
      amplitude, with S(k) = exp(-(k Sigma_sm)^2 / 2) the reconstruction
      smoothing kernel (nonzero only in 'reciso' mode);
    - ``FoG(k, mu)`` = [1 + (k mu sigma_s)^2 / 2]^-2, Lorentzian
      fingers-of-God;
    - ``D(k, mu)`` = exp(-k^2 (sigma_par^2 mu^2 + sigma_per^2 (1-mu^2)) / 2),
      anisotropic nonlinear BAO damping;
    - the wiggle signal, absolute ``Pw = P - Pnw`` or relative
      ``O = P/Pnw - 1``, always sampled at the AP coordinates (the BAO scale
      is what the dilation parameters move).

    models:
    - 'standard' (Chen et al. 2023 propagator form):
      ``P = Kaiser(k,mu) FoG(k,mu) Pnw(k) + Kaiser(k',mu') D(k',mu') Pw(k')``
      — smooth part fully at observed coordinates, wiggle part fully
      AP-dilated (S(k) kept at fiducial k in both, per the reference);
    - Howlett et al. 2023 family, ``P = Kaiser Pnw x combine(FoG, D O)``:
      'fog-damping' (Beutler et al. 2016) multiplies, ``FoG (1 + D O)``;
      otherwise it adds, ``FoG + D O``. 'fix-damping' pins D at observed
      coordinates; 'move-all' dilates the smooth factors too.
    """

    def _recon_smoothing(self, k):
        """S(k): large-scale displacement suppression for 'reciso'
        reconstruction; zero otherwise."""
        if self.mode == 'reciso':
            return jnp.exp(-0.5 * (k * self.smoothing_radius) ** 2)
        return 0.

    def _kaiser(self, b1, f, k, mu):
        return (b1 + f * mu ** 2 * (1. - self._recon_smoothing(k))) ** 2

    @staticmethod
    def _fog(sigmas, k, mu):
        return (1. + 0.5 * (sigmas * k * mu) ** 2) ** -2

    @staticmethod
    def _damping(sigmapar, sigmaper, k, mu):
        mu2 = mu ** 2
        return jnp.exp(-0.5 * k ** 2 * (sigmapar ** 2 * mu2 + sigmaper ** 2 * (1. - mu2)))

    def calculate(self, b1=1., dbeta=1., sigmas=0., sigmapar=9., sigmaper=6., **kw):
        f = dbeta * self.template.f
        kobs, muobs = self.k[:, None], self.mu
        _, kap, muap = self.template.ap_k_mu(self.k, self.mu)
        pnw = self.template.pknow_dd_interp
        wiggle = self.template.pk_dd_interp(kap) - pnw(kap)

        if self.model == 'standard':
            smooth = (self._kaiser(b1, f, kobs, muobs) * self._fog(sigmas, kobs, muobs)
                      * pnw(kobs))
            # wiggle propagator: everything AP-dilated except S(k), which the
            # reference takes at fiducial coordinates
            sk = self._recon_smoothing(kobs)
            propagator = ((b1 + f * muap ** 2 * (1. - sk)) ** 2
                          * self._damping(sigmapar, sigmaper, kap, muap))
            pkmu = smooth + propagator * wiggle
        else:
            fix_damping = 'fix-damping' in self.model
            move_all = 'move-all' in self.model
            kd, mud = (kobs, muobs) if fix_damping else (kap, muap)
            ks, mus = (kap, muap) if move_all else (kobs, muobs)
            damped_ratio = wiggle / pnw(kap) * self._damping(sigmapar, sigmaper, kd, mud)
            smooth = self._kaiser(b1, f, ks, mus) * pnw(ks)
            fog = self._fog(sigmas, ks, mus)
            if 'fog-damping' in self.model:
                pkmu = smooth * fog * (1. + damped_ratio)
            else:
                pkmu = smooth * (fog + damped_ratio)
        self.power = self.to_poles(pkmu)


class SimpleBAOWigglesPowerSpectrumMultipoles(DampedBAOWigglesPowerSpectrumMultipoles):
    """Moves only the BAO wiggles with the scaling parameters (reference bao.py:177)."""

    def initialize(self, *args, model='fix-damping', **kwargs):
        super().initialize(*args, model=model, **kwargs)


class ResummedBAOWigglesPowerSpectrumMultipoles(BaseBAOWigglesPowerSpectrumMultipoles):
    r"""IR-resummed BAO wiggles (reference bao.py:190,349; arXiv:1907.00043):
    damping Sigma computed from the template pknow via (1 - j0) integrals."""

    def initialize(self, *args, shotnoise=0., **kwargs):
        super().initialize(*args, **kwargs)
        self.shotnoise = float(shotnoise)
        # static resummation integrals from the fiducial no-wiggle pk
        from scipy.integrate import simpson
        from scipy.special import spherical_jn
        k = np.asarray(self.template.init.get('k'))
        # fiducial tables not yet computed here; use host eval at fiducial
        self.template.runtime_info.initialize()
        pklin = np.asarray(self.template.pknow_dd_fid, dtype='f8')
        q = self.template.rs_drag_fid
        j0 = spherical_jn(0, q * k)
        sk = np.exp(-0.5 * (k * self.smoothing_radius) ** 2) if self.mode else 0.
        skc = 1. - sk
        self.sigma_sn2 = 1. / self.smoothing_radius / 6. / np.pi ** 1.5
        self.sigma_nl2 = simpson((1. - j0) * pklin, x=k) / (3. * np.pi ** 2)
        self.sigma_dd2 = simpson((1. - j0) * skc ** 2 * pklin, x=k) / (3. * np.pi ** 2)
        if self.mode == 'reciso':
            self.sigma_x2 = simpson((1. - j0) * skc * pklin, x=k) / (3. * np.pi ** 2)

    def wiggles(self, k, mu, b1=1., f=0., d=1.):
        wig = self.template.pk_dd_interp(k) - self.template.pknow_dd_interp(k)
        ksq = (1. + f * (f + 2.) * mu ** 2) * k ** 2
        d2 = d ** 2
        sigma_dd2 = self.sigma_dd2 + self.shotnoise * self.sigma_sn2 / b1 ** 2
        sk = jnp.exp(-0.5 * (k * self.smoothing_radius) ** 2)
        skc = 1. - sk
        if self.mode == 'recsym':
            res = (b1 + f * mu ** 2) ** 2 * jnp.exp(-0.5 * ksq * d2 * sigma_dd2)
        elif self.mode == 'reciso':
            res = (b1 + f * mu ** 2 * skc - sk) ** 2 * jnp.exp(-0.5 * ksq * d2 * sigma_dd2)
            sigma_ds2 = (1. + f * mu ** 2) * sigma_dd2 + f * (1. + f) * mu ** 2 * self.sigma_x2
            res += 2. * (b1 + f * mu ** 2 * skc - sk) * (1. + f * mu ** 2) * sk * jnp.exp(-0.5 * ksq * d2 * sigma_ds2)
            sigma_ss2 = sigma_dd2 + f ** 2 * mu ** 2 * self.sigma_nl2 + 2. * f * mu ** 2 * self.sigma_x2
            res += (1. + f * mu ** 2) ** 2 * sk ** 2 * jnp.exp(-0.5 * ksq * d2 * sigma_ss2)
        else:
            res = (b1 + f * mu ** 2) ** 2 * jnp.exp(-0.5 * ksq * d2 * sigma_dd2)
        return res * wig

    def calculate(self, b1=1., dbeta=1., sigmas=0., d=1., **kw):
        f = dbeta * self.template.f
        jac, kap, muap = self.template.ap_k_mu(self.k, self.mu)
        k, mu = self.k[:, None], self.mu
        pknow = self.template.pknow_dd_interp(k)
        fog = 1. / (1. + (sigmas * k * mu) ** 2 / 2.) ** 2
        sk = 0.
        if self.mode == 'reciso':
            sk = jnp.exp(-0.5 * (k * self.smoothing_radius) ** 2)
        pksmooth = (b1 + f * mu ** 2 * (1. - sk)) ** 2 * pknow * fog
        damped_wiggles = self.wiggles(kap, muap, b1=b1, f=f, d=d) / self.template.pknow_dd_interp(kap)
        pkmu = pksmooth * (1. + damped_wiggles)
        self.power = self.to_poles(pkmu)


class FlexibleBAOWigglesPowerSpectrumMultipoles(BaseBAOWigglesPowerSpectrumMultipoles):
    """Wiggles modulated by spline kernels (reference bao.py:269): the wiggle
    amplitude per (ell, node) is a free linear parameter."""

    @staticmethod
    def _params(init):
        params = {}
        ells = tuple(init.get('ells', (0, 2)))
        kp = init.get('kp', 0.06283)
        k = init.get('k')
        kmax = float(np.max(k)) if k is not None else 0.3
        nmax = int(np.ceil(kmax / kp)) + 2
        for ell in ells:
            for n in range(-2, nmax):
                params['ml{:d}_{:d}'.format(ell, n)] = dict(
                    value=1. if (ell == ells[0] and n == 0) else 0.,
                    prior=dict(dist='norm', loc=0., scale=10.),
                    ref=dict(limits=[-1e-3, 1e-3]), delta=0.005,
                    latex='m_{{{:d},{:d}}}'.format(ell, n))
        params['b1'] = dict(value=1.5, prior=dict(limits=[0.2, 4.]), ref=dict(limits=[1.5, 2.5]), latex='b')
        return params

    def initialize(self, *args, kp=None, kernel='tsc', **kwargs):
        super().initialize(*args, **kwargs)
        self.kernel = str(kernel)
        if kp is None:
            # rs_drag_fid is set by the template's initialize
            self.template.runtime_info.initialize()
        self.kp = 2. * np.pi / self.rs_drag_fid if kp is None else float(kp)
        names = [p.basename for p in self.params if re.match(r'ml(\d+)_(-?\d+)', p.basename)]
        self._wiggle_orders = {}
        for ell in self.ells:
            self._wiggle_orders[ell] = {name: int(re.match(r'ml(\d+)_(-?\d+)', name).group(2))
                                        for name in names if int(re.match(r'ml(\d+)_(-?\d+)', name).group(1)) == ell}
        self._kernels = {ell: np.array([_kernel_func(self.k / self.kp - n, self.kernel)
                                        for n in orders.values()])
                         for ell, orders in self._wiggle_orders.items()}

    def calculate(self, b1=1., **params):
        f = self.template.f
        jac, kap, muap = self.template.ap_k_mu(self.k, self.mu)
        pknowap = self.template.pknow_dd_interp(kap)
        pkap = self.template.pk_dd_interp(kap)
        wig = (pkap - pknowap) / pknowap
        k, mu = self.k[:, None], self.mu
        pknow = self.template.pknow_dd_interp(k)
        kaiser = (b1 + f * mu ** 2) ** 2
        rows = []
        smooth_poles = self.to_poles(kaiser * pknow)
        wiggle_mu = kaiser * pknow * wig     # (nk, nmu)
        wiggle_poles_kernels = {}
        for ill, ell in enumerate(self.ells):
            amp = jnp.stack([jnp.asarray(params.get(name, 0.)) for name in self._wiggle_orders[ell]])
            kernel = jnp.asarray(self._kernels[ell])  # (nnode, nk)
            modulation = jnp.einsum('n,nk->k', amp, kernel)
            rows.append(smooth_poles[ill] + self.to_poles(wiggle_mu * modulation[:, None])[ill])
        self.power = jnp.stack(rows)


def _adjust_model_params(pt_cls, params):
    """Per-model deltas from the Damped default parameter set (reference
    bao.yaml declares these per class): the resummed model has no Gaussian
    Sigma_par/perp damping — its damping comes from the (1 - j0) pknow
    integrals — and carries the fixed growth-scaling parameter ``d``
    (ref bao.py:205 wiggles(..., d=1.))."""
    if pt_cls is not None and issubclass(pt_cls, ResummedBAOWigglesPowerSpectrumMultipoles):
        params.pop('sigmapar', None)
        params.pop('sigmaper', None)
        params['d'] = dict(value=1., prior=dict(limits=[0., 4.]),
                           ref=dict(limits=[0.8, 1.2]), latex='d', fixed=True)


class BaseBAOWigglesTracerPowerSpectrumMultipoles(BaseTheoryPowerSpectrumMultipoles):
    r"""BAO P_l(k) with broadband terms (reference bao.py:424).

    broadband='power' (powers k^-3..k^1 scaled by kp=2 pi/rd), 'power3'
    (3 powers), or spline kernels 'ngp'/'cic'/'tsc'/'pcs'.
    """

    _pt_cls = DampedBAOWigglesPowerSpectrumMultipoles
    # broadband coefficients enter linearly with a static basis: their
    # marginalization design matrix is a compile-time constant
    _static_linear_solved = ('al*',)

    @classmethod
    def _params(cls, init):
        params = {
            'b1': dict(value=1.5, prior=dict(limits=[0.2, 4.]), ref=dict(limits=[1.5, 2.5]), proposal=0.1, latex='b'),
            'dbeta': dict(value=1., prior=dict(limits=[0.7, 1.3]), ref=dict(limits=[0.8, 1.2]), delta=0.02, proposal=0.1, latex=r'd\beta'),
            'sigmas': dict(value=0., prior=dict(limits=[0., 10.]), ref=dict(limits=[0., 1.]), latex=r'\Sigma_s', fixed=True),
            'sigmapar': dict(value=9., prior=dict(limits=[0.1, 10.]), latex=r'\Sigma_\parallel', fixed=True),
            'sigmaper': dict(value=6., prior=dict(limits=[0.1, 10.]), latex=r'\Sigma_\perp', fixed=True),
        }
        _adjust_model_params(getattr(cls, '_pt_cls', None), params)
        broadband = str(init.get('broadband', 'power'))
        ells = tuple(init.get('ells', (0, 2)))
        if 'power' in broadband:
            for ell in ells:
                for pow in range(-3, 2):
                    cfg = dict(value=0., ref=dict(limits=[-1e2, 1e2]), delta=0.005,
                               latex='a_{{{:d},{:d}}}'.format(ell, pow), fixed=False)
                    if broadband == 'power3' and pow not in (-2, -1, 0):
                        cfg['fixed'] = True
                    params['al{:d}_{:d}'.format(ell, pow)] = cfg
        else:
            for ell in ells:
                for ik in range(-2, 10):
                    params['al{:d}_{:d}'.format(ell, ik)] = dict(
                        value=0., prior=dict(dist='norm', loc=0., scale=1e4),
                        ref=dict(limits=[-1e-2, 1e-2]), delta=0.005,
                        latex='a_{{{:d},{:d}}}'.format(ell, ik))
        return params

    def initialize(self, k=None, ells=(0, 2), broadband='power', kp=None, pt=None, **kwargs):
        super().initialize(k=k, ells=ells)
        if pt is None:
            pt = self._pt_cls()
        self.pt = pt
        self.pt.init.update(k=self.k, ells=self.ells, **kwargs)
        self.pt.runtime_info.initialize()
        self.broadband = str(broadband)
        self.kp = 2. * np.pi / self.pt.rs_drag_fid if kp is None else float(kp)
        self._set_broadband()
        # forward non-broadband params to the pt node (reference bao.py:500-525
        # set_params): the tracer keeps only the broadband coefficients.
        bb_names = set()
        for orders in self.broadband_orders.values():
            bb_names |= set(orders)
        for param in list(self.params):
            if param.basename not in bb_names and param.derived is not True:
                self.pt.init.params.set(param)
                del self.params[param.name]
        self.pt.runtime_info.initialized = False

    def _set_broadband(self):
        # classify al{ell}_{n} params into per-ell bases (reference bao.py:23-40, 495-525)
        self.broadband_orders = {ell: {} for ell in self.ells}
        for param in list(self.params):
            match = re.match(r'al(\d+)_(-?\d+)', param.basename)
            if match:
                ell, ind = int(match.group(1)), int(match.group(2))
                if ell in self.ells:
                    self.broadband_orders[ell][param.basename] = ind
                else:
                    del self.params[param.name]
        self.broadband_matrix = {}
        if 'power' in self.broadband:
            for ell in self.ells:
                self.broadband_matrix[ell] = np.array(
                    [(self.k / self.kp) ** pow for pow in self.broadband_orders[ell].values()])
        elif self.broadband in ('ngp', 'cic', 'tsc', 'pcs'):
            pknow_fid = self.pt.template.pknow_dd_fid
            ktab = np.asarray(self.pt.template.k)
            for ell in self.ells:
                rows, orders = [], {}
                for name, ik in self.broadband_orders[ell].items():
                    kernel = _kernel_func(self.k / self.kp - ik, self.broadband)
                    if not np.allclose(kernel, 0., atol=1e-8):
                        amp = np.interp(np.clip(ik * self.kp, ktab[0], ktab[-1]), ktab, pknow_fid)
                        rows.append(kernel * amp)
                        orders[name] = ik
                    else:
                        self.params[self.params.select(basename=name)[0].name].update(fixed=True)
                self.broadband_orders[ell] = orders
                self.broadband_matrix[ell] = np.array(rows)
        else:
            raise ValueError('unknown broadband {}'.format(self.broadband))

    def get_broadband(self, **params):
        rows = []
        for ell in self.ells:
            names = list(self.broadband_orders[ell])
            if names:
                coeffs = jnp.stack([jnp.asarray(params.get(name, 0.)) for name in names])
                rows.append(coeffs @ jnp.asarray(self.broadband_matrix[ell]))
            else:
                rows.append(jnp.zeros(len(self.k)))
        return jnp.stack(rows)

    def calculate(self, **params):
        # pt is a requirement: its calculate already ran with its own params
        self.power = self.pt.power + self.get_broadband(**params)

    @property
    def template(self):
        return self.pt.template

    def get(self):
        return self.power


class DampedBAOWigglesTracerPowerSpectrumMultipoles(BaseBAOWigglesTracerPowerSpectrumMultipoles):
    _pt_cls = DampedBAOWigglesPowerSpectrumMultipoles


class SimpleBAOWigglesTracerPowerSpectrumMultipoles(BaseBAOWigglesTracerPowerSpectrumMultipoles):
    _pt_cls = SimpleBAOWigglesPowerSpectrumMultipoles


class ResummedBAOWigglesTracerPowerSpectrumMultipoles(BaseBAOWigglesTracerPowerSpectrumMultipoles):
    _pt_cls = ResummedBAOWigglesPowerSpectrumMultipoles


class FlexibleBAOWigglesTracerPowerSpectrumMultipoles(BaseBAOWigglesTracerPowerSpectrumMultipoles):
    _pt_cls = FlexibleBAOWigglesPowerSpectrumMultipoles


class BaseBAOWigglesCorrelationFunctionMultipoles(BaseTheoryCorrelationFunctionFromPowerSpectrumMultipoles):
    """Wiggle-only BAO xi_l(s) — no broadband (reference bao.py:766-857,
    non-tracer classes): the FFTLog transform of the corresponding wiggle
    P_l(k) model. The Tracer wrappers below add the s-power broadband."""

    _pt_power_cls = None  # set by subclasses

    @classmethod
    def _params(cls, init):
        # same pt-model params as the tracer wrapper, minus the broadband
        # (reference bao.py:766-857 — non-tracer classes carry the model
        # parameters; broadband lives on the Tracer wrappers)
        params = dict(BaseBAOWigglesTracerPowerSpectrumMultipoles._params(init))
        params = {name: cfg for name, cfg in params.items() if not name.startswith('al')}
        _adjust_model_params(getattr(cls, '_pt_power_cls', None), params)
        return params

    def initialize(self, s=None, ells=(0, 2), **kwargs):
        super().initialize(s=s, power=self._pt_power_cls(), ells=ells, **kwargs)
        # forward the model params to the power node (same pattern as the
        # tracer wrappers, bao.py:329-338): this node keeps none.
        for param in list(self.params):
            if param.derived is not True:
                self.power.init.params.set(param)
                del self.params[param.name]
        self.power.runtime_info.initialized = False

    @property
    def template(self):
        return self.power.template


class DampedBAOWigglesCorrelationFunctionMultipoles(BaseBAOWigglesCorrelationFunctionMultipoles):
    """xi counterpart of :class:`DampedBAOWigglesPowerSpectrumMultipoles`
    (reference bao.py:784)."""

    _pt_power_cls = DampedBAOWigglesPowerSpectrumMultipoles


class SimpleBAOWigglesCorrelationFunctionMultipoles(BaseBAOWigglesCorrelationFunctionMultipoles):
    """xi counterpart of :class:`SimpleBAOWigglesPowerSpectrumMultipoles`
    (reference bao.py:795)."""

    _pt_power_cls = SimpleBAOWigglesPowerSpectrumMultipoles


class ResummedBAOWigglesCorrelationFunctionMultipoles(BaseBAOWigglesCorrelationFunctionMultipoles):
    """xi counterpart of :class:`ResummedBAOWigglesPowerSpectrumMultipoles`
    (reference bao.py:806)."""

    _pt_power_cls = ResummedBAOWigglesPowerSpectrumMultipoles


class FlexibleBAOWigglesCorrelationFunctionMultipoles(BaseBAOWigglesCorrelationFunctionMultipoles):
    """xi counterpart of :class:`FlexibleBAOWigglesPowerSpectrumMultipoles`
    (reference bao.py:817)."""

    _pt_power_cls = FlexibleBAOWigglesPowerSpectrumMultipoles


class BaseBAOWigglesTracerCorrelationFunctionMultipoles(BaseTheoryCorrelationFunctionFromPowerSpectrumMultipoles):
    """BAO xi_l(s) with even-power broadband in s (reference bao.py:766+)."""

    _pt_power_cls = DampedBAOWigglesPowerSpectrumMultipoles
    _static_linear_solved = ('al*',)

    @classmethod
    def _params(cls, init):
        params = dict(BaseBAOWigglesTracerPowerSpectrumMultipoles._params(init))
        # correlation-function broadband: powers of s^-2, s^-1, s^0
        for name in [n for n in params if n.startswith('al')]:
            del params[name]
        _adjust_model_params(getattr(cls, '_pt_power_cls', None), params)
        ells = tuple(init.get('ells', (0, 2)))
        for ell in ells:
            for pow in range(-2, 1):
                params['al{:d}_{:d}'.format(ell, pow)] = dict(
                    value=0., ref=dict(limits=[-1e-2, 1e-2]), delta=0.002,
                    latex='a_{{{:d},{:d}}}'.format(ell, pow))
        return params

    def initialize(self, s=None, ells=(0, 2), **kwargs):
        power = self._pt_power_cls()
        super().initialize(s=s, power=power, ells=ells, **kwargs)
        self.broadband_orders = {}
        self._split_broadband()

    def _split_broadband(self):
        for param in list(self.params):
            match = re.match(r'al(\d+)_(-?\d+)', param.basename)
            if match:
                ell, pow = int(match.group(1)), int(match.group(2))
                if ell in self.ells:
                    self.broadband_orders.setdefault(ell, {})[param.basename] = pow
                else:
                    del self.params[param.name]
        self.broadband_matrix = {ell: np.array([self.s ** pow for pow in orders.values()])
                                 for ell, orders in self.broadband_orders.items()}
        # forward non-broadband params to the power node
        bb_names = set()
        for orders in self.broadband_orders.values():
            bb_names |= set(orders)
        for param in list(self.params):
            if param.basename not in bb_names and param.derived is not True:
                self.power.init.params.set(param)
                del self.params[param.name]
        self.power.runtime_info.initialized = False

    def calculate(self, **params):
        corr = self.get_corr(self.power.power)
        rows = []
        for ill, ell in enumerate(self.ells):
            names = list(self.broadband_orders.get(ell, {}))
            bb = 0.
            if names:
                coeffs = jnp.stack([jnp.asarray(params.get(name, 0.)) for name in names])
                bb = coeffs @ jnp.asarray(self.broadband_matrix[ell])
            rows.append(corr[ill] + bb)
        self.corr = jnp.stack(rows)

    @property
    def template(self):
        return self.power.template


class DampedBAOWigglesTracerCorrelationFunctionMultipoles(BaseBAOWigglesTracerCorrelationFunctionMultipoles):
    _pt_power_cls = DampedBAOWigglesPowerSpectrumMultipoles


class SimpleBAOWigglesTracerCorrelationFunctionMultipoles(BaseBAOWigglesTracerCorrelationFunctionMultipoles):
    _pt_power_cls = SimpleBAOWigglesPowerSpectrumMultipoles


class ResummedBAOWigglesTracerCorrelationFunctionMultipoles(BaseBAOWigglesTracerCorrelationFunctionMultipoles):
    _pt_power_cls = ResummedBAOWigglesPowerSpectrumMultipoles


class FlexibleBAOWigglesTracerCorrelationFunctionMultipoles(BaseBAOWigglesTracerCorrelationFunctionMultipoles):
    _pt_power_cls = FlexibleBAOWigglesPowerSpectrumMultipoles
