"""Planck 2020 (NPIPE/PR4) hillipop high-ell TT/TE/EE likelihood.

Counterpart of reference likelihoods/cmb/hillipop.py (itself a JAX port of
planck-npipe/hillipop): Gaussian likelihood on cross-half-mission spectra
with a physical foreground model (point sources, dust, CIB, tSZ, kSZ,
SZxCIB, synchrotron) and per-map calibrations.

TPU-first redesign: every per-cross-spectrum Python loop in the reference
becomes a precomputed array at initialization --

- foreground ell-shapes are stacked static (nxspec, lmax+1) templates; the
  parameter dependence is a per-cross-spectrum scalar factor, so each
  component is one broadcasted FMA;
- cross-spectrum -> cross-frequency averaging is ONE (nxfreq, nxspec)
  matmul (the reference already builds this matrix, ref hillipop.py:616-634);
- multipole-range selection uses STATIC slices fixed at init (dynamic
  gathers are ~40x elementwise cost on TPU);
- chi2 through the whitened-residual Gaussian base.

Real Planck PR4 data files need fitsio (absent here); the machinery accepts
the same arrays via ``data=`` and ships power-law template fallbacks where
the reference reads files (clearly marked approximations).
"""

import itertools

import numpy as np
import jax.numpy as jnp

from ..base import BaseLikelihood

T_CMB = 2.72548
K_B = 1.3806503e-23
H_PL = 6.626068e-34

# Planck effective frequencies (reference hillipop.py:36-42)
FREQ_EFF = {
    'sz': {100: 100.24, 143: 143., 217: 222.044},
    'dust': {100: 105.2, 143: 147.5, 217: 228.1, 353: 370.5},
    'cib': {100: 105.2, 143: 147.5, 217: 228.1, 353: 370.5},
    'syn': {100: 100., 143: 143., 217: 217.},
    'radio': {100: 100.4, 143: 140.5, 217: 218.6},
}
F0 = 143


def _f_tsz(freq):
    x = H_PL * freq * 1e9 / (K_B * T_CMB)
    return x / np.tanh(x / 2.) - 4.


def _f_planck(f, T):
    nu = f * 1e9
    return nu ** 3 / (np.exp(H_PL * nu / (K_B * T)) - 1.)


def _dbdt(f):
    nu = f * 1e9
    x = H_PL * nu / (K_B * T_CMB)
    return nu ** 4 * np.exp(x) / (np.exp(x) - 1.) ** 2


def tsz_ratio(f, f0=F0):
    return _f_tsz(f) / _f_tsz(f0)


def cib_ratio(f, f0, beta):
    """Modified blackbody ratio in thermodynamic units (T=25K)."""
    T = 25.
    return (f / f0) ** beta * (_f_planck(f, T) / _f_planck(f0, T)) * (_dbdt(f0) / _dbdt(f))


def dust_ratio(f, f0, beta):
    """Dust modified blackbody (T=19.6K)."""
    T = 19.6
    return (f / f0) ** beta * (_f_planck(f, T) / _f_planck(f0, T)) * (_dbdt(f0) / _dbdt(f))


def radio_ratio(f, f0, beta):
    return (f / f0) ** beta * (_dbdt(f0) / _dbdt(f))


def powerlaw_dl(lmax, alpha, lnorm=3000):
    """D_ell power-law template normalized at lnorm (reference
    hillipop.py:98-113)."""
    nmax = max(lmax, lnorm or lmax)
    ell = np.arange(2, nmax + 1, dtype='f8')
    t = np.zeros(nmax + 1)
    t[2:] = ell * (ell + 1) / (2 * np.pi) * ell ** alpha
    if lnorm is not None:
        t = t / t[lnorm]
    return t[:lmax + 1]


class FgComponent(object):
    """One foreground: dl(pars) = factor_xs(pars)[:, None] * shape_xs.

    shape : (nxspec, lmax+1) static template (muK^2 D_ell, normalized)
    factor : callable pars -> (nxspec,) jnp array
    modes : which modes this component contributes to.
    """

    def __init__(self, name, shape, factor, modes=('TT',)):
        self.name = name
        self.shape = np.asarray(shape, dtype='f8')
        self.factor = factor
        self.modes = tuple(modes)

    def dl(self, pars, mode):
        if mode not in self.modes:
            return 0.
        return self.factor(pars, mode)[:, None] * jnp.asarray(self.shape)


def build_foregrounds(mode, frequencies, lmax, templates=None):
    """Assemble the standard hillipop foreground set for one mode.

    templates : dict, optional arrays:
        'dust_TT'/'dust_EE'/'dust_TE' : (nxfreq, lmax+1) galactic dust per
        cross-frequency (reference reads DUST_Planck_PR4_model files),
        'tsz', 'ksz', 'cib', 'szxcib' : (lmax+1,) — power-law fallbacks
        (documented approximations) are used when absent.
    """
    templates = dict(templates or {})
    xfreqs = list(itertools.combinations(frequencies, 2))
    nxspec = len(xfreqs)
    ll2pi = np.arange(lmax + 1, dtype='f8')
    ll2pi = ll2pi * (ll2pi + 1) / (3000. * 3001.)

    def pairs(d):
        return [(d[f1], d[f2]) for f1, f2 in xfreqs]

    def template(name, alpha):
        if name in templates:
            t = np.asarray(templates[name], dtype='f8')
            out = np.zeros(lmax + 1)
            n = min(lmax + 1, len(t))
            out[:n] = t[:n]
            return out
        return powerlaw_dl(lmax, alpha)

    comps = []
    if mode == 'TT':
        radio_f = pairs(FREQ_EFF['radio'])
        comps.append(FgComponent(
            'ps_radio', np.tile(ll2pi, (nxspec, 1)),
            lambda pars, m, _f=radio_f: pars['Aradio'] * jnp.asarray(
                [radio_ratio(f1, F0, -0.8) * radio_ratio(f2, F0, -0.8) for f1, f2 in _f])))
        cib_f = pairs(FREQ_EFF['cib'])
        comps.append(FgComponent(
            'ps_dusty', np.tile(ll2pi, (nxspec, 1)),
            lambda pars, m, _f=cib_f: pars['Adusty'] * jnp.stack(
                [cib_ratio_jnp(f1, F0, pars['beta_cib']) * cib_ratio_jnp(f2, F0, pars['beta_cib'])
                 for f1, f2 in _f])))
        t_cib = template('cib', -1.3)
        comps.append(FgComponent(
            'cib', np.tile(t_cib, (nxspec, 1)),
            lambda pars, m, _f=cib_f: pars['Acib'] * jnp.stack(
                [cib_ratio_jnp(f1, F0, pars['beta_cib']) * cib_ratio_jnp(f2, F0, pars['beta_cib'])
                 for f1, f2 in _f])))
        sz_f = pairs(FREQ_EFF['sz'])
        t_tsz = template('tsz', -0.5)
        tsz_shape = np.stack([t_tsz * tsz_ratio(f1) * tsz_ratio(f2) for f1, f2 in sz_f])
        comps.append(FgComponent('tsz', tsz_shape, lambda pars, m: pars['Atsz'] * jnp.ones(nxspec)))
        t_ksz = template('ksz', -0.6)
        comps.append(FgComponent('ksz', np.tile(t_ksz, (nxspec, 1)),
                                 lambda pars, m: pars['Aksz'] * jnp.ones(nxspec)))
        t_x = template('szxcib', -1.0)
        comps.append(FgComponent(
            'szxcib', np.tile(t_x, (nxspec, 1)),
            lambda pars, m, _fs=sz_f, _fc=cib_f: -pars['xi']
            * jnp.sqrt(jnp.abs(pars['Acib'] * pars['Atsz'])) * jnp.stack(
                [tsz_ratio(fs2) * cib_ratio_jnp(fc1, F0, pars['beta_cib'])
                 + tsz_ratio(fs1) * cib_ratio_jnp(fc2, F0, pars['beta_cib'])
                 for (fs1, fs2), (fc1, fc2) in zip(_fs, _fc)])))
    # galactic dust: per-cross-frequency template, amplitude x MBB ratios
    dust_key = 'dust_' + mode
    dust_f = pairs(FREQ_EFF['dust'])
    if dust_key in templates:
        shape = np.asarray(templates[dust_key], dtype='f8')[:, :lmax + 1]
        if shape.shape[0] != nxspec:
            # per-cross-FREQUENCY columns (the real DUST_Planck_PR4 file
            # layout, ref hillipop.py:270-276): expand to cross-spectra by
            # frequency-pair lookup
            freqs_u = sorted(set(frequencies))
            xfreq_pairs = [(f1, f2) for i, f1 in enumerate(freqs_u) for f2 in freqs_u[i:]]
            idx = [xfreq_pairs.index(tuple(sorted(p))) for p in xfreqs]
            shape = shape[idx]
    else:
        # fallback: steep power law with the galactic TT/EE/TE hierarchy
        amp = {'TT': 1., 'EE': 0.02, 'TE': 0.1, 'ET': 0.1}[mode]
        shape = np.tile(amp * powerlaw_dl(lmax, -2.6, lnorm=80), (nxspec, 1))

    def dust_factor(pars, m, _f=dust_f):
        aT, bT = pars['AdustT'], pars['beta_dustT']
        aP, bP = pars.get('AdustP', aT), pars.get('beta_dustP', bT)
        a1, b1 = (aT, bT) if m[0] == 'T' else (aP, bP)
        a2, b2 = (aT, bT) if m[1] == 'T' else (aP, bP)
        f353 = FREQ_EFF['dust'][353]
        return a1 * a2 * jnp.stack([dust_ratio_jnp(f1, f353, b1) * dust_ratio_jnp(f2, f353, b2)
                                    for f1, f2 in _f])

    comps.append(FgComponent('dust', shape, dust_factor, modes=('TT', 'EE', 'TE', 'ET')))
    return comps


def cib_ratio_jnp(f, f0, beta):
    """cib_ratio with traced beta (static frequency factors precomputed)."""
    T = 25.
    static = (_f_planck(f, T) / _f_planck(f0, T)) * (_dbdt(f0) / _dbdt(f))
    return (f / f0) ** beta * static


def dust_ratio_jnp(f, f0, beta):
    T = 19.6
    static = (_f_planck(f, T) / _f_planck(f0, T)) * (_dbdt(f0) / _dbdt(f))
    return (f / f0) ** beta * static


def _hillipop_params(modes):
    params = {
        'A_planck': dict(value=1., prior=dict(dist='norm', loc=1., scale=0.0025),
                         ref=dict(dist='norm', loc=1., scale=0.002), proposal=0.0005,
                         latex=r'y_\mathrm{cal}'),
    }
    for m in ('100A', '100B', '143B', '217A', '217B'):
        params['cal' + m] = dict(value=1., prior=dict(limits=[0.9, 1.1]),
                                 ref=dict(dist='norm', loc=1., scale=0.005),
                                 latex=r'c_\mathrm{{{}}}'.format(m))
    params['cal143A'] = dict(value=1., fixed=True, latex=r'c_\mathrm{143A}')
    if 'EE' in modes or 'TE' in modes:
        for m in ('100A', '100B', '143A', '143B', '217A', '217B'):
            params['pe' + m] = dict(value=1., fixed=True, latex=r'pe_\mathrm{{{}}}'.format(m))
    if 'TT' in modes:
        params.update({
            'Aradio': dict(value=60., prior=dict(limits=[0., 150.]),
                           ref=dict(dist='norm', loc=60., scale=1.), latex=r'A_\mathrm{radio}^\mathrm{PS}'),
            'Adusty': dict(value=6., prior=dict(limits=[0., 100.]),
                           ref=dict(dist='norm', loc=6., scale=1.), latex=r'A_\mathrm{IR}^\mathrm{PS}'),
            'Acib': dict(value=4., prior=dict(limits=[0., 20.]),
                         ref=dict(dist='norm', loc=4., scale=1.), latex=r'A_\mathrm{CIB}'),
            'beta_cib': dict(value=1.75, prior=dict(dist='norm', loc=1.75, scale=0.06),
                             latex=r'\beta_\mathrm{CIB}'),
            'Atsz': dict(value=3., prior=dict(limits=[0., 50.]),
                         ref=dict(dist='norm', loc=3., scale=1.), latex=r'A_\mathrm{tSZ}'),
            'Aksz': dict(value=1., prior=dict(limits=[0., 50.]),
                         ref=dict(dist='norm', loc=1., scale=1.), latex=r'A_\mathrm{kSZ}'),
            'xi': dict(value=0.1, prior=dict(limits=[-1., 1.]),
                       ref=dict(dist='norm', loc=0.1, scale=0.1), latex=r'\xi_\mathrm{SZxCIB}'),
        })
    params.update({
        'AdustT': dict(value=1., prior=dict(dist='norm', loc=1., scale=0.1),
                       ref=dict(dist='norm', loc=1., scale=0.02), latex=r'A_\mathrm{dustT}'),
        'beta_dustT': dict(value=1.51, prior=dict(dist='norm', loc=1.51, scale=0.01),
                           latex=r'\beta_\mathrm{dustT}'),
    })
    if 'EE' in modes or 'TE' in modes:
        params.update({
            'AdustP': dict(value=1., prior=dict(dist='norm', loc=1., scale=0.1),
                           ref=dict(dist='norm', loc=1., scale=0.02), latex=r'A_\mathrm{dustP}'),
            'beta_dustP': dict(value=1.59, prior=dict(dist='norm', loc=1.59, scale=0.02),
                               latex=r'\beta_\mathrm{dustP}'),
        })
    return params


class BaseHillipopLikelihood(BaseLikelihood):
    """Hillipop machinery for a set of modes among TT/EE/TE.

    Parameters
    ----------
    theory : ClTheory
    data : dict
        'dldata' : {mode: (nxspec, lmax+1)} measured cross-spectra D_ell
        (muK^2; modes among TT, EE, TE, ET),
        'dlweight' : same layout, inverse-variance combination weights,
        'invcov' : (ndata, ndata) precision of the flattened data vector,
        'lmins'/'lmaxs' : {mode: (nxfreq,)} multipole ranges,
        'templates' : optional foreground templates (see build_foregrounds),
        'frequencies' : default (100, 100, 143, 143, 217, 217).
    """

    modes = ('TT', 'EE', 'TE')
    name = 'Hillipop'

    @classmethod
    def _params(cls, init):
        base = dict(BaseLikelihood._params)
        base.update(_hillipop_params(cls.modes))
        return base

    def initialize(self, theory=None, data=None, data_dir=None, **kwargs):
        if data is None and data_dir is None:
            from ...install import installed_data_dir
            data_dir = installed_data_dir('Planck2020HillipopLikelihood')
        if data is None and data_dir is not None:
            data = read_hillipop_data(data_dir, modes=self.modes)
        if data is None:
            raise ValueError('provide data= dict (see class docstring) or '
                             'data_dir= with the PR4 hillipop products')
        self.frequencies = tuple(data.get('frequencies', (100, 100, 143, 143, 217, 217)))
        self._mapnames = tuple(data.get('mapnames', ('100A', '100B', '143A', '143B', '217A', '217B')))
        nmap = len(self.frequencies)
        freqs = sorted(set(self.frequencies))
        self._nxspec = nmap * (nmap - 1) // 2
        self._nxfreq = len(freqs) * (len(freqs) + 1) // 2
        # xspec -> xfreq map + averaging matrix (reference hillipop.py:616)
        xfreq_pairs = [(f1, f2) for i, f1 in enumerate(freqs) for f2 in freqs[i:]]
        self._xspec_pairs = list(itertools.combinations(range(nmap), 2))
        self._xspec2xfreq = [xfreq_pairs.index(tuple(sorted((self.frequencies[m1], self.frequencies[m2]))))
                             for m1, m2 in self._xspec_pairs]
        avg = np.zeros((self._nxfreq, self._nxspec))
        for xs, xf in enumerate(self._xspec2xfreq):
            avg[xf, xs] = 1.
        self._avg = avg

        self._dldata = {m: np.asarray(v, dtype='f8') for m, v in data['dldata'].items()}
        if 'ET' not in self._dldata and 'TE' in self._dldata:
            self._dldata['ET'] = self._dldata['TE']
        self.lmax = max(v.shape[1] - 1 for v in self._dldata.values())
        default_w = {m: np.ones_like(v) for m, v in self._dldata.items()}
        self._dlweight = {m: np.asarray(v, dtype='f8') for m, v in
                          data.get('dlweight', default_w).items()}
        if 'ET' not in self._dlweight and 'TE' in self._dlweight:
            self._dlweight['ET'] = self._dlweight['TE']
        self._lmins = {m: np.asarray(v, dtype='i8') for m, v in data['lmins'].items()}
        self._lmaxs = {m: np.asarray(v, dtype='i8') for m, v in data['lmaxs'].items()}
        self.precision = np.asarray(data['invcov'], dtype='f8')

        # foregrounds per mode
        self._fgs = {}
        for mode in self.modes:
            submodes = (mode, 'ET') if mode == 'TE' else (mode,)
            for sm in submodes:
                self._fgs[sm] = build_foregrounds(sm, self.frequencies, self.lmax,
                                                  templates=data.get('templates'))

        # data vector: weighted xfreq average of the measured spectra
        flat = []
        for mode in self.modes:
            if mode == 'TE':
                r, w = self._xfreq_accum('TE', jnp.asarray(self._dldata['TE']))
                r2, w2 = self._xfreq_accum('ET', jnp.asarray(self._dldata['ET']))
                avg_spec = np.asarray((r + r2) / (w + w2))
            else:
                r, w = self._xfreq_accum(mode, jnp.asarray(self._dldata[mode]))
                avg_spec = np.asarray(r / w)
            flat += self._select(avg_spec, mode)
        self.flatdata = np.concatenate(flat)
        if len(self.flatdata) != self.precision.shape[0]:
            raise ValueError('invcov size {} != data vector size {}'.format(
                self.precision.shape[0], len(self.flatdata)))

        from .base import ClTheory
        if theory is None:
            raise ValueError('pass theory=ClTheory(tables=...)')
        self.theory = theory
        cls_needed = {}
        for mode in self.modes:
            cls_needed[mode.lower() if mode != 'TE' else 'te'] = self.lmax
        if 'TT' in self.modes or 'TE' in self.modes:
            cls_needed['tt'] = self.lmax
        if 'EE' in self.modes or 'TE' in self.modes:
            cls_needed['ee'] = self.lmax
        if isinstance(theory, ClTheory):
            cls = dict(theory.init.get('cls') or {})
            for xy, ellmax in cls_needed.items():
                cls[xy] = max(int(ellmax), int(cls.get(xy, 0)))
            self.theory.init.update(cls=cls, unit='muK', T0=2.7255)
        ells = np.arange(self.lmax + 1)
        self.factor = ells * (ells + 1) / 2. / np.pi

    # --- machinery ---

    def _xfreq_accum(self, mode, spectra):
        """(nxspec, lmax+1) -> weighted sums per cross-frequency: returns
        (sum w*cl, sum w), each (nxfreq, lmax+1) -- one matmul each."""
        w = jnp.asarray(self._dlweight[mode][:, :spectra.shape[1]])
        avg = jnp.asarray(self._avg)
        return avg @ (w * spectra), avg @ w

    def _select(self, xfreq_spectra, mode):
        """Static-slice multipole-range selection (per cross-frequency)."""
        out = []
        for xf in range(self._nxfreq):
            lo, hi = int(self._lmins[mode][xf]), int(self._lmaxs[mode][xf])
            out.append(xfreq_spectra[xf, lo:hi + 1])
        return out

    def _calibrations(self, pars, mode):
        cal = []
        for m1, m2 in self._xspec_pairs:
            n1, n2 = self._mapnames[m1], self._mapnames[m2]
            c1, c2 = pars['cal' + n1], pars['cal' + n2]
            if mode == 'EE':
                c1, c2 = c1 * pars['pe' + n1], c2 * pars['pe' + n2]
            elif mode == 'TE':
                c2 = c2 * pars['pe' + n2]
            elif mode == 'ET':
                c1 = c1 * pars['pe' + n1]
            cal.append(c1 * c2 / pars['A_planck'] ** 2)
        return jnp.stack(cal)

    def _model_xfreq(self, pars, dlth, mode):
        """cal_xs * (Dl_CMB + sum fg) averaged to cross-frequency."""
        model = jnp.broadcast_to(dlth[mode], (self._nxspec, dlth[mode].shape[0]))
        for fg in self._fgs[mode]:
            contrib = fg.dl(pars, mode)
            if not (isinstance(contrib, float) and contrib == 0.):
                model = model + contrib
        cal = self._calibrations(pars, mode)
        return cal[:, None] * model

    def loglike_of_dl(self, dlth, **pars):
        """dlth: {'TT'/'EE'/'TE': (lmax+1,) D_ell muK^2}."""
        dlth = dict(dlth)
        if 'TE' in dlth:
            dlth['ET'] = dlth['TE']
        flat = []
        for mode in self.modes:
            if mode == 'TE':
                r1, w1 = self._xfreq_accum('TE', self._model_xfreq(pars, dlth, 'TE'))
                r2, w2 = self._xfreq_accum('ET', self._model_xfreq(pars, dlth, 'ET'))
                avg_spec = (r1 + r2) / (w1 + w2)
            else:
                r, w = self._xfreq_accum(mode, self._model_xfreq(pars, dlth, mode))
                avg_spec = r / w
            flat += self._select(avg_spec, mode)
        self.flattheory = jnp.concatenate(flat)
        diff = jnp.asarray(self.flatdata) - self.flattheory
        chi2 = diff @ jnp.asarray(self.precision) @ diff
        return -0.5 * chi2

    def calculate(self, **params):
        factor = jnp.asarray(self.factor)
        dlth = {}
        for mode in self.modes:
            xy = mode.lower() if mode != 'TE' else 'te'
            dlth[mode] = self.theory.cls[xy][:self.lmax + 1] * factor
        self.loglikelihood = self.loglike_of_dl(dlth, **params)


class TTTEEEHighlPlanck2020HillipopLikelihood(BaseHillipopLikelihood):
    modes = ('TT', 'EE', 'TE')
    name = 'TTTEEEHighlPlanck2020Hillipop'


class TTHighlPlanck2020HillipopLikelihood(BaseHillipopLikelihood):
    modes = ('TT',)
    name = 'TTHighlPlanck2020Hillipop'


class EEHighlPlanck2020HillipopLikelihood(BaseHillipopLikelihood):
    modes = ('EE',)
    name = 'EEHighlPlanck2020Hillipop'


class TEHighlPlanck2020HillipopLikelihood(BaseHillipopLikelihood):
    modes = ('TE',)
    name = 'TEHighlPlanck2020Hillipop'


# --------------------------------------------------------------------------
# Real Planck PR4 (v4.2) file layout: reader + writer
#
# The reference reads these products with fitsio (ref hillipop.py:640-706):
#   data/binning_v4.2.fits                      BINTABLE per mode: header
#                                               'SPEC', columns LMIN/LMAX per
#                                               cross-SPECTRUM (nxspec=15)
#   data/dl_PR4_v4.2_{mA}x{mB}.fits             image ext 1: (>=4, lmax+1)
#                                               D_ell in K^2, rows TT/EE/BB/TE;
#                                               ext 2: same-layout sigma;
#                                               the reversed {mB}x{mA} file's
#                                               row 3 is the ET spectrum
#   data/invfll_PR4_v4.2_{MODES}.fits           image: flat (n*n,) inverse
#                                               covariance in K^-4
#   foregrounds/DUST_Planck_PR4_model_v4.2_{mode}.txt   columns: ell + one per
#                                               cross-frequency (6)
#   foregrounds/{SZ,kSZ,CIB,SZxCIB}_Planck_PR4_model.txt  columns: ell, D_ell
#                                               (normalized at ell=3000 on read)
#
# Here the same layouts go through the in-repo minimal FITS codec
# (desilike_tpu/io_fits.py) so the real-product code path is exercised in a
# zero-egress container; the writer produces byte-layout-faithful fixtures.

DUST_XFREQ_COLUMNS = ('100x100', '100x143', '100x217', '143x143', '143x217', '217x217')
_SCALAR_TEMPLATES = {'tsz': 'SZ_Planck_PR4_model.txt',
                     'ksz': 'kSZ_Planck_PR4_model.txt',
                     'cib': 'CIB_Planck_PR4_model.txt',
                     'szxcib': 'SZxCIB_Planck_PR4_model.txt'}


def _xspec_maps(frequencies):
    freqs = sorted(set(frequencies))
    xfreq_pairs = [(f1, f2) for i, f1 in enumerate(freqs) for f2 in freqs[i:]]
    xspec_pairs = list(itertools.combinations(range(len(frequencies)), 2))
    xspec2xfreq = [xfreq_pairs.index(tuple(sorted((frequencies[m1], frequencies[m2]))))
                   for m1, m2 in xspec_pairs]
    return xspec_pairs, xspec2xfreq, len(xfreq_pairs)


def _read_dl_template_txt(filename, lmax, lnorm=3000):
    """(ell, D_ell) text template -> dense (lmax+1,), normalized at lnorm
    (reference hillipop.py:115-134)."""
    ell, data = np.loadtxt(filename, unpack=True)
    ell = np.asarray(ell, dtype='i8')
    t = np.zeros(max(lmax, int(ell.max())) + 1)
    t[ell] = data
    # real PR4 templates extend past lnorm; small-lmax fixtures don't --
    # skip the normalization rather than divide by an absent/zero bin
    if lnorm is not None and lnorm < len(t) and t[lnorm] != 0:
        t = t / t[lnorm]
    return t[:lmax + 1]


def read_hillipop_data(data_dir, modes=('TT', 'EE', 'TE'), version='v4.2',
                       frequencies=(100, 100, 143, 143, 217, 217),
                       mapnames=('100A', '100B', '143A', '143B', '217A', '217B')):
    """Load the real Planck PR4 hillipop products; returns the dict consumed
    by ``BaseHillipopLikelihood(data=...)``. ``modes`` must match the
    inverse-covariance file's mode suffix (e.g. TT/EE/TE -> TTTEEE)."""
    import os
    from ... import io_fits

    _, xspec2xfreq, nxfreq = _xspec_maps(frequencies)

    # multipole ranges: per-xspec in the file, per-xfreq in the data dict
    # (the reference itself only ever uses the first xspec of each xfreq,
    # ref hillipop.py:728-729)
    lmins, lmaxs = {}, {}
    fn = os.path.join(data_dir, 'data', 'binning_{}.fits'.format(version))
    for hdu in io_fits.hdus(fn)[1:]:
        hdr = hdu.read_header()
        tag = str(hdr.get('SPEC', hdr.get('spec', ''))).strip()
        first = [xspec2xfreq.index(xf) for xf in range(nxfreq)]
        lmins[tag] = np.asarray(hdu['LMIN'], dtype='i8')[first]
        lmaxs[tag] = np.asarray(hdu['LMAX'], dtype='i8')[first]
    lmax = int(max(v.max() for v in lmaxs.values()))

    # cross-spectra + weights: one file per ordered half-mission map pair
    basename = os.path.join(data_dir, 'data', 'dl_PR4_{}'.format(version))
    dldata = {m: [] for m in ('TT', 'EE', 'TE', 'ET')}
    dlsig = {m: [] for m in ('TT', 'EE', 'TE', 'ET')}
    for m1, m2 in itertools.combinations(mapnames, 2):
        for ext, dest in ((1, dldata), (2, dlsig)):
            fwd = io_fits.read('{}_{}x{}.fits'.format(basename, m1, m2), ext=ext) * 1e12
            rev = io_fits.read('{}_{}x{}.fits'.format(basename, m2, m1), ext=ext) * 1e12
            dest['TT'].append(fwd[0, :lmax + 1])
            dest['EE'].append(fwd[1, :lmax + 1])
            dest['TE'].append(fwd[3, :lmax + 1])
            dest['ET'].append(rev[3, :lmax + 1])
    dldata = {m: np.asarray(v) for m, v in dldata.items()}
    dlweight = {}
    for m, v in dlsig.items():
        sig = np.asarray(v)
        sig[sig == 0] = np.inf  # zero sigma marks unmeasured bins (ref :516)
        dlweight[m] = 1. / sig ** 2

    fn = os.path.join(data_dir, 'data',
                      'invfll_PR4_{}_{}.fits'.format(version, ''.join(modes)))
    invcov = np.asarray(io_fits.read(fn), dtype='f8').reshape(-1)
    n = int(round(np.sqrt(invcov.size)))
    invcov = invcov.reshape(n, n) / 1e24  # K^-4 -> muK^-4

    templates = {}
    fgdir = os.path.join(data_dir, 'foregrounds')
    for mode in ('TT', 'EE', 'TE'):
        fn = os.path.join(fgdir, 'DUST_Planck_PR4_model_{}_{}.txt'.format(version, mode))
        if os.path.exists(fn):
            tab = np.loadtxt(fn).T
            ell = np.asarray(tab[0], dtype='i8')
            dust = np.zeros((len(DUST_XFREQ_COLUMNS), max(lmax, int(ell.max())) + 1))
            for xf in range(len(DUST_XFREQ_COLUMNS)):
                dust[xf, ell] = tab[1 + xf]
            templates['dust_' + mode] = dust[:, :lmax + 1]
    for key, base in _SCALAR_TEMPLATES.items():
        fn = os.path.join(fgdir, base)
        if os.path.exists(fn):
            templates[key] = _read_dl_template_txt(fn, lmax)

    out = {'dldata': {m: dldata[m] for m in set(modes) | ({'TE', 'ET'} if 'TE' in modes else set())},
           'dlweight': {m: dlweight[m] for m in set(modes) | ({'TE', 'ET'} if 'TE' in modes else set())},
           'lmins': lmins, 'lmaxs': lmaxs, 'invcov': invcov,
           'frequencies': tuple(frequencies), 'mapnames': tuple(mapnames)}
    if templates:
        out['templates'] = templates
    return out


def write_hillipop_data(data_dir, data, version='v4.2', modes=('TT', 'EE', 'TE')):
    """Write the Planck PR4 hillipop file layout (inverse of
    :func:`read_hillipop_data`) — fixture generator for exercising the
    real-product readers without network access."""
    import os
    from ... import io_fits

    frequencies = tuple(data.get('frequencies', (100, 100, 143, 143, 217, 217)))
    mapnames = tuple(data.get('mapnames', ('100A', '100B', '143A', '143B', '217A', '217B')))
    xspec_pairs, xspec2xfreq, nxfreq = _xspec_maps(frequencies)
    os.makedirs(os.path.join(data_dir, 'data'), exist_ok=True)
    os.makedirs(os.path.join(data_dir, 'foregrounds'), exist_ok=True)

    dldata = {m: np.asarray(v, dtype='f8') for m, v in data['dldata'].items()}
    if 'ET' not in dldata and 'TE' in dldata:
        dldata['ET'] = dldata['TE']
    lmax = max(v.shape[1] - 1 for v in dldata.values())
    default_w = {m: np.ones_like(v) for m, v in dldata.items()}
    dlweight = {m: np.asarray(v, dtype='f8')
                for m, v in data.get('dlweight', default_w).items()}
    if 'ET' not in dlweight and 'TE' in dlweight:
        dlweight['ET'] = dlweight['TE']

    # binning: broadcast the per-xfreq ranges back to every xspec
    tables = []
    for mode in modes:
        lmin_xf = np.asarray(data['lmins'][mode], dtype='i8')
        lmax_xf = np.asarray(data['lmaxs'][mode], dtype='i8')
        tables.append(io_fits.Hdu(
            columns={'LMIN': lmin_xf[xspec2xfreq], 'LMAX': lmax_xf[xspec2xfreq]},
            header={'SPEC': mode}))
    io_fits.write(os.path.join(data_dir, 'data', 'binning_{}.fits'.format(version)),
                  tables)

    basename = os.path.join(data_dir, 'data', 'dl_PR4_{}'.format(version))

    def spectra_image(xs, te_mode):
        img = np.zeros((4, lmax + 1))
        img[0] = dldata['TT'][xs] if 'TT' in dldata else 0.
        img[1] = dldata['EE'][xs] if 'EE' in dldata else 0.
        img[3] = dldata[te_mode][xs] if te_mode in dldata else 0.
        return img * 1e-12  # muK^2 -> K^2 on disk

    def sigma_image(xs, te_mode):
        img = np.zeros((4, lmax + 1))
        for row, m in ((0, 'TT'), (1, 'EE'), (3, te_mode)):
            if m in dlweight:
                w = dlweight[m][xs]
                img[row] = np.where(w > 0, 1. / np.sqrt(np.maximum(w, 1e-300)), 0.)
        return img * 1e-12

    for xs, (m1, m2) in enumerate(itertools.combinations(mapnames, 2)):
        io_fits.write('{}_{}x{}.fits'.format(basename, mapnames[xspec_pairs[xs][0]],
                                             mapnames[xspec_pairs[xs][1]]),
                      [io_fits.Hdu(), io_fits.Hdu(data=spectra_image(xs, 'TE')),
                       io_fits.Hdu(data=sigma_image(xs, 'TE'))])
        io_fits.write('{}_{}x{}.fits'.format(basename, mapnames[xspec_pairs[xs][1]],
                                             mapnames[xspec_pairs[xs][0]]),
                      [io_fits.Hdu(), io_fits.Hdu(data=spectra_image(xs, 'ET')),
                       io_fits.Hdu(data=sigma_image(xs, 'ET'))])

    invcov = np.asarray(data['invcov'], dtype='f8') * 1e24
    io_fits.write(os.path.join(data_dir, 'data',
                               'invfll_PR4_{}_{}.fits'.format(version, ''.join(modes))),
                  [io_fits.Hdu(data=invcov.reshape(-1))])

    templates = data.get('templates') or {}
    ell = np.arange(lmax + 1)
    for mode in modes:
        key = 'dust_' + ('TE' if mode == 'ET' else mode)
        if key in templates:
            dust = np.asarray(templates[key], dtype='f8')
            tab = np.column_stack([ell] + [dust[xf, :lmax + 1]
                                           for xf in range(dust.shape[0])])
            np.savetxt(os.path.join(
                data_dir, 'foregrounds',
                'DUST_Planck_PR4_model_{}_{}.txt'.format(version, mode)), tab)
    for key, base in _SCALAR_TEMPLATES.items():
        if key in templates:
            t = np.asarray(templates[key], dtype='f8')
            np.savetxt(os.path.join(data_dir, 'foregrounds', base),
                       np.column_stack([ell[:len(t)], t]))
