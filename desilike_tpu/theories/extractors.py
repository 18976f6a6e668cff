"""Extractors: compressed parameters from a (varied) cosmology.

Counterpart of reference power_template.py extractor classes (BAOExtractor
:261, ShapeFitPowerSpectrumExtractor :602, StandardPowerSpectrumExtractor
:441): compute (qpar, qper, df, dm, ...) from base cosmological parameters,
for compression observables and template<->direct consistency.
Everything is differentiable through the EH98 backend.
"""

import numpy as np
import jax
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


_EXTRACT_K = np.geomspace(1e-4, 10., 512)


def _sigma_r2_and_slope(pk_func, r, kernel='gauss'):
    r"""(sigma_r^2, d sigma_r^2 / d ln r) on the static extractor k grid.

    sigma_r^2 = 1/(2 pi^2) \int k^2 P(k) K(kr) dk; the ln-r derivative uses
    dK/dln r analytically (gauss: K = e^{-x^2}, K' = -2 x^2 e^{-x^2};
    tophat: K = W^2(x), K' = x d(W^2)/dx), so the wiggle-split slope m is
    differentiable end to end."""
    from ..ops.legendre import trapz_weights
    k = jnp.asarray(_EXTRACT_K)
    pk = pk_func(k)
    x = k * r
    if kernel == 'gauss':
        K = jnp.exp(-x ** 2)
        Kp = -2. * x ** 2 * K
    elif kernel == 'tophat':
        from ..cosmology.linear import tophat_window
        w = tophat_window(x)
        K = w ** 2
        # d(W^2)/dln r = x d(W^2)/dx, with dW/dx = (x^2 W - sin x + x cos x)... use AD
        Kp = x * jax.grad(lambda xx: jnp.sum(tophat_window(xx) ** 2))(x)
    else:
        raise ValueError(kernel)
    wk = jnp.asarray(trapz_weights(_EXTRACT_K))
    norm = 1. / (2. * np.pi ** 2)
    s2 = norm * jnp.sum(wk * k ** 2 * pk * K)
    ds2 = norm * jnp.sum(wk * k ** 2 * pk * Kp)
    return s2, ds2


def _parabolic_logmax(k, pk):
    """Turn-over (k_TO, P_TO) by parabolic refinement of the log-log maximum
    (same estimator as TurnOverPowerSpectrumTemplate; arXiv:2302.07484)."""
    lk = jnp.log10(jnp.asarray(k))
    lp = jnp.log10(pk)
    i = jnp.clip(jnp.argmax(lp), 1, len(k) - 2)
    x0, x1, x2 = lk[i - 1], lk[i], lk[i + 1]
    y0, y1, y2 = lp[i - 1], lp[i], lp[i + 1]
    c0 = y0 / ((x0 - x1) * (x0 - x2))
    c1 = y1 / ((x1 - x0) * (x1 - x2))
    c2 = y2 / ((x2 - x0) * (x2 - x1))
    a = c0 + c1 + c2
    lk0 = (c0 * (x1 + x2) + c1 * (x0 + x2) + c2 * (x0 + x1)) / (2. * a)
    lp0 = c0 * (lk0 - x1) * (lk0 - x2) + c1 * (lk0 - x0) * (lk0 - x2) + c2 * (lk0 - x0) * (lk0 - x1)
    return 10. ** lk0, 10. ** lp0


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


class WiggleSplitPowerSpectrumExtractor(BAOExtractor):
    r"""Wiggle-split (qbao, qap, df, dm) extraction (reference :1079):
    amplitude and ln-r slope of the velocity spectrum smoothed at
    r = 8 (DV/DV_fid) Mpc/h, plus the BAO dilation. Differentiable through
    any cosmology engine (pk via ``cosmo.pk_dd``, velocities as f^2 pk in
    linear theory)."""

    _params = dict(BAOExtractor._params)
    _params.update({name: dict(derived=True) for name in ('qbao', 'df', 'dm', 'm', 'fsigmar')})

    def initialize(self, *args, r=8., kernel='gauss', **kwargs):
        self.r = float(r)
        self.kernel = str(kernel)
        super().initialize(*args, **kwargs)
        p = self.fiducial
        DH = float(bg.hubble_distance(p, self.z))
        DM = float(bg.comoving_angular_distance(p, self.z))
        self.DV_fid = DH ** self.eta * DM ** (1. - self.eta) * self.z ** (1. / 3.)
        f_fid = float(bg.growth_rate(p, self.z))
        s2, ds2 = _sigma_r2_and_slope(lambda k: f_fid ** 2 * lin.pk_lin(p, k, self.z),
                                      self.r, self.kernel)
        self.fsigmar_fid = float(jnp.sqrt(s2))
        self.m_fid = float(-ds2 / s2 - 3.)

    def calculate(self, **params):
        super().calculate(**params)
        f = self.cosmo.growth_rate(self.z)
        DV = self.DV_over_rd * self.cosmo.rs_drag()
        r = self.r * DV / self.DV_fid
        s2, ds2 = _sigma_r2_and_slope(lambda k: f ** 2 * self.cosmo.pk_dd(k, self.z),
                                      r, self.kernel)
        self.fsigmar = jnp.sqrt(s2)
        self.m = -ds2 / s2 - 3.
        self.qbao = self.qiso
        self.df = self.fsigmar / self.fsigmar_fid
        self.dm = self.m - self.m_fid


class BandVelocityPowerSpectrumExtractor(BAOExtractor):
    r"""Band velocity power (dptt_i, df, qap) extraction (reference :767):
    the velocity power spectrum at pivots kp/qiso (volume-rescaled by
    qiso^3) relative to the fiducial, and the r = 8 qiso growth amplitude."""

    @staticmethod
    def _params(init):
        kp = init.get('kp', None)
        n = len(kp) if kp is not None else 0
        params = {name: dict(derived=True) for name in BAOExtractor._params}
        params.update({name: dict(derived=True) for name in ('df', 'fsigmar')})
        for i in range(n):
            params['dptt{:d}'.format(i)] = dict(derived=True, latex=r'\Delta P_{{\theta\theta,{:d}}}'.format(i))
        return params

    def initialize(self, *args, kp=None, **kwargs):
        if kp is None:
            raise ValueError('provide band pivots kp')
        self.kp = np.asarray(kp, dtype='f8')
        super().initialize(*args, **kwargs)
        p = self.fiducial
        f_fid = float(bg.growth_rate(p, self.z))
        self.pk_tt_fid = f_fid ** 2 * np.asarray(lin.pk_lin(p, jnp.asarray(self.kp), self.z), dtype='f8')
        self.fsigmar_fid = f_fid * float(lin.sigma_r(p, 8., self.z))

    def calculate(self, **params):
        super().calculate(**params)
        f = self.cosmo.growth_rate(self.z)
        qiso = self.qiso
        pk_tt = f ** 2 * self.cosmo.pk_dd(jnp.asarray(self.kp) / qiso, self.z) / qiso ** 3
        self.dptt = pk_tt / jnp.asarray(self.pk_tt_fid)
        for i in range(len(self.kp)):
            setattr(self, 'dptt{:d}'.format(i), self.dptt[i])
        self.fsigmar = f * self.cosmo.sigma_r(8. * qiso, self.z)
        self.df = self.fsigmar / self.fsigmar_fid


class TurnOverPowerSpectrumExtractor(BAOExtractor):
    r"""Turn-over (DV_times_kTO, DM_over_DH, qto, qap) extraction
    (reference :1235; arXiv:2302.07484): the matter power spectrum maximum
    located by parabolic log-log refinement on a static k grid."""

    _params = dict(BAOExtractor._params)
    _params.update({name: dict(derived=True) for name in
                    ('kTO', 'DV_times_kTO', 'DM_over_DH', 'qto')})

    _KTO_GRID = np.geomspace(2e-3, 0.1, 160)

    def initialize(self, *args, **kwargs):
        super().initialize(*args, **kwargs)
        p = self.fiducial
        kto_fid, _ = _parabolic_logmax(self._KTO_GRID,
                                       jnp.asarray(lin.pk_lin(p, jnp.asarray(self._KTO_GRID), self.z)))
        self.kTO_fid = float(kto_fid)
        DH = float(bg.hubble_distance(p, self.z))
        DM = float(bg.comoving_angular_distance(p, self.z))
        self.DV_fid = DH ** self.eta * DM ** (1. - self.eta) * self.z ** (1. / 3.)
        self.DV_times_kTO_fid = self.DV_fid * self.kTO_fid

    def calculate(self, **params):
        super().calculate(**params)
        pk = self.cosmo.pk_dd(jnp.asarray(self._KTO_GRID), self.z)
        self.kTO, _ = _parabolic_logmax(self._KTO_GRID, pk)
        DH = self.cosmo.hubble_distance(self.z)
        DM = self.cosmo.comoving_angular_distance(self.z)
        DV = DH ** self.eta * DM ** (1. - self.eta) * self.z ** (1. / 3.)
        self.DV_times_kTO = DV * self.kTO
        self.DM_over_DH = DM / DH
        self.qto = self.DV_times_kTO / self.DV_times_kTO_fid


class BAOPhaseShiftExtractor(BAOExtractor):
    r"""BAO + neutrino-phase-shift extraction (reference :392;
    arXiv:1803.10741): baoshift measures N_eff through the phase-shift
    amplitude relative to the fiducial."""

    _params = dict(BAOExtractor._params)
    _params.update({'baoshift': dict(derived=True, latex=r'\beta_\phi')})

    A_NU = 8. / 7. * (11. / 4.) ** (4. / 3.)

    def initialize(self, *args, **kwargs):
        super().initialize(*args, **kwargs)
        p = self.fiducial
        from .cosmology import TNCDM_NEFF
        self.N_eff_fid = float(p['N_ur']) + float(p.get('N_ncdm', 1)) * TNCDM_NEFF

    def calculate(self, **params):
        super().calculate(**params)
        neff = self.cosmo.N_eff
        self.baoshift = (neff * (self.N_eff_fid + self.A_NU)) / (self.N_eff_fid * (neff + self.A_NU))
