"""CMB C_ell theory node.

Counterpart of reference likelihoods/cmb/base.py:16 (ClTheory), redesigned
for the TPU framework's zero-Boltzmann constraint: the reference calls CLASS
through cosmoprimo per evaluation; here the production path is *injection* —
high-accuracy C_ell tables (and optionally their parameter derivatives)
computed once by any Boltzmann code are injected at initialization, and the
traced program is pure table algebra (a first-order Taylor response in the
cosmological parameters when derivatives are given). This is the same
protocol as FixedLinearPower for the matter pk (SURVEY.md §2.10) and is what
the binding layer populates from a host code (cosmo_requires).

Everything downstream (binning, foregrounds, H&L transforms) consumes
``self.cls`` — a dict xy -> (ellmax+1,) array — so a future emulated Cl node
is drop-in.
"""

import numpy as np
import jax.numpy as jnp

from ...core import Calculator


ALLOWED_CLS = ('tt', 'ee', 'bb', 'te', 'tb', 'eb', 'pp', 'tp', 'ep')


class ClTheory(Calculator):
    """Theory CMB C_ell^{xy} from injected tables.

    Parameters
    ----------
    cls : dict
        Requested spectra: {xy: ellmax} with xy in tt, ee, bb, te, tb, eb
        (lensed) and pp, tp, ep (lensing potential).
    tables : dict
        {xy: array} raw (dimensionless) C_ell starting at ell=0. Spectra
        requested but absent (or 'tb'/'eb') are zero.
    derivatives : dict, default=None
        {param_name: {xy: dC_ell/dparam array}} first-order response tables;
        each named parameter is registered (varied) with fiducial value
        ``center[param_name]`` and C_ell = table + sum_i (p_i - center_i) *
        dtable_i. Exact for linear parameters (e.g. A-like amplitudes),
        first-order otherwise.
    derivatives2 : dict, default=None
        {(name_i, name_j): {xy: d2C_ell/dp_i dp_j array}} second-order
        response tables (quadratic Taylor; mixed keys count once, so pass
        the symmetric sum convention d2C and the 1/2 (1 for i!=j) multiset
        factors are applied here). Parameters appearing only here are also
        registered.
    center : dict, default=None
        Expansion point for ``derivatives``/``derivatives2``.
    emulator : dict or path, default=None
        Emulated-Cl engine weights (see likelihoods/cmb/cl_emulator.py):
        the network recomputes full C_ell tables from the cosmological
        parameters each evaluation — the path that lifts the Taylor-response
        limit entirely. Mutually exclusive with tables/derivatives.
    unit : str, default=None
        None (raw) or 'muK': multiply by (T0 * 1e6)^(2 - n_p) with n_p the
        number of 'p' in xy (reference cmb/base.py:96-99).
    T0 : float, default=2.7255
        CMB temperature for the muK conversion.
    """

    _propagate_namespace = False

    @staticmethod
    def _params(init):
        params = {}
        center = dict(init.get('center') or {})
        names = list(init.get('derivatives') or {})
        for pair in (init.get('derivatives2') or {}):
            for name in pair:
                if name not in names:
                    names.append(name)
        emulator = init.get('emulator')
        if emulator is not None:
            from ...cosmology.emulator import load_weights
            if isinstance(emulator, str) or hasattr(emulator, '__fspath__'):
                emulator = load_weights(emulator)
            fid = dict(emulator.get('fiducial') or {})
            for name in emulator['param_names']:
                params[name] = dict(value=float(fid.get(name, 0.)),
                                    prior=dict(limits=[-np.inf, np.inf]),
                                    delta=0.01, latex=name.replace('_', r'\_'))
            return params
        for name in names:
            params[name] = dict(value=float(center.get(name, 0.)),
                                prior=dict(limits=[-np.inf, np.inf]),
                                delta=0.01, latex=name.replace('_', r'\_'))
        return params

    def initialize(self, cls=None, tables=None, derivatives=None, derivatives2=None,
                   center=None, unit=None, T0=2.7255, lensing=None, non_linear=None,
                   emulator=None):
        self.requested_cls = dict(cls or {})
        for xy in self.requested_cls:
            if xy not in ALLOWED_CLS:
                raise ValueError('unknown Cl {}; allowed: {}'.format(xy, ALLOWED_CLS))
        if unit not in (None, 'muK'):
            raise ValueError("unit must be None or 'muK'")
        self.unit = unit
        self.T0 = float(T0)
        if emulator is not None:
            self._init_emulator(emulator)
            return
        self._emu = None
        if tables is None:
            raise ValueError(
                'ClTheory needs injected C_ell tables or emulator weights: the in-framework '
                'EH98 backend has no Boltzmann hierarchy. Compute the tables once with '
                "CLASS/CAMB and pass tables={'tt': cl_tt, ...} (+ optional derivatives=/"
                'derivatives2= for a differentiable Taylor response), pass emulator= '
                '(likelihoods/cmb/cl_emulator.py) for full recomputation per evaluation, '
                'or use the binding layer to source tables from a host code.')
        self._tables = {k: np.asarray(v, dtype='f8') for k, v in tables.items()}
        self._derivs = {name: {k: np.asarray(v, dtype='f8') for k, v in tabs.items()}
                        for name, tabs in (derivatives or {}).items()}
        self._derivs2 = {tuple(pair): {k: np.asarray(v, dtype='f8') for k, v in tabs.items()}
                         for pair, tabs in (derivatives2 or {}).items()}
        names = list(self._derivs)
        for pair in self._derivs2:
            names.extend(n for n in pair if n not in names)
        self._center = {name: float((center or {}).get(name, 0.)) for name in names}

        self._base, self._resp, self._resp2 = {}, {}, {}
        for xy, ellmax in self.requested_cls.items():
            ellmax = int(ellmax)
            if xy in ('tb', 'eb') and xy not in self._tables:
                self._base[xy] = np.zeros(ellmax + 1)
            else:
                if xy not in self._tables:
                    raise ValueError('no table injected for requested Cl {}'.format(xy))
                self._base[xy] = _prepare(self._tables[xy], ellmax)
            unit_factor = self._unit_factor(xy)
            self._base[xy] = self._base[xy] * unit_factor
            for name, tabs in self._derivs.items():
                if xy in tabs:
                    self._resp.setdefault(name, {})[xy] = _prepare(tabs[xy], ellmax) * unit_factor
            for pair, tabs in self._derivs2.items():
                if xy in tabs:
                    self._resp2.setdefault(pair, {})[xy] = _prepare(tabs[xy], ellmax) * unit_factor

    def _unit_factor(self, xy):
        if self.unit == 'muK':
            return (self.T0 * 1e6) ** (2 - xy.count('p'))
        return 1.

    def _init_emulator(self, emulator):
        """Emulated-Cl engine: the MLP recomputes the full tables each
        evaluation (no Taylor limit). See likelihoods/cmb/cl_emulator.py."""
        from ...cosmology.emulator import load_weights
        if isinstance(emulator, str) or hasattr(emulator, '__fspath__'):
            emulator = load_weights(emulator)
        self._emu = emulator
        self._center = dict(emulator.get('fiducial') or {})
        spectra = tuple(emulator['spectra'])
        for xy in self.requested_cls:
            if xy not in spectra and xy not in ('tb', 'eb'):
                raise ValueError('emulator predicts {}, not requested {}'.format(spectra, xy))

    def calculate(self, **params):
        if self._emu is not None:
            from .cl_emulator import predict_cls
            theta = jnp.stack([jnp.asarray(params.get(name, self._center.get(name, 0.)),
                                           dtype=jnp.result_type(float))
                               for name in self._emu['param_names']])
            predicted = predict_cls(self._emu, theta)
            cls = {}
            for xy, ellmax in self.requested_cls.items():
                ellmax = int(ellmax)
                if xy in ('tb', 'eb') and xy not in predicted:
                    cls[xy] = jnp.zeros(ellmax + 1)
                    continue
                tab = predicted[xy]
                n = min(ellmax + 1, tab.shape[0])
                out = jnp.zeros(ellmax + 1).at[:n].set(tab[:n])
                cls[xy] = out * self._unit_factor(xy)
            self.cls = cls
            return
        cls = {xy: jnp.asarray(base) for xy, base in self._base.items()}
        deltas = {name: jnp.asarray(params.get(name, self._center[name])) - self._center[name]
                  for name in self._center}
        for name, tabs in self._resp.items():
            for xy, dtab in tabs.items():
                cls[xy] = cls[xy] + deltas[name] * jnp.asarray(dtab)
        for (ni, nj), tabs in self._resp2.items():
            # Taylor multiset factor: 1/2 for diagonal terms, 1 for mixed
            # (each unordered pair appears once in derivatives2)
            factor = 0.5 if ni == nj else 1.
            for xy, dtab in tabs.items():
                cls[xy] = cls[xy] + factor * deltas[ni] * deltas[nj] * jnp.asarray(dtab)
        self.cls = cls

    def get(self):
        return self.cls


def _prepare(tab, ellmax):
    out = np.zeros(ellmax + 1)
    n = min(ellmax + 1, len(tab))
    out[:n] = tab[:n]
    return out


def synthetic_cl_tables(lmax=2600, seed=None, amp=1., tilt=0., theta=1., damp_scale=1.):
    """Smooth CMB-like C_ell fixture (damped acoustic oscillations) for tests
    and examples — NOT a Boltzmann computation. Raw (dimensionless) units.
    Returns dict with tt, ee, te, bb, pp.

    The optional parameters give the fixture a CMB-like cosmology response
    for emulator/Taylor-response tests: ``amp`` scales the overall power
    (A_s-like), ``tilt`` adds a spectral slope (n_s-like), ``theta`` shifts
    the acoustic phase (theta_*-like), ``damp_scale`` moves the damping tail
    (omega_b-like)."""
    ell = np.arange(lmax + 1).astype('f8')
    ells = np.maximum(ell, 1.)
    # acoustic envelope: Dl_tt ~ plateau * oscillations * damping
    x = theta * ell / 220.
    osc = 1. + 0.6 * np.cos(np.pi * x) * np.exp(-ell / 1600.)
    damp = np.exp(-(ell / (1200. * damp_scale)) ** 1.4)
    dl_tt = amp * 1e-10 * (5.e3 * (ells / 200.) ** (0.04 + tilt) * osc * damp
                           + 1.e3 * np.exp(-ell / 80.))
    cl_tt = 2. * np.pi * dl_tt / (ells * (ells + 1.))
    cl_ee = 0.04 * cl_tt * (1. + 0.8 * np.sin(np.pi * x)) ** 2
    cl_te = 0.35 * np.sqrt(np.abs(cl_tt * cl_ee)) * np.cos(np.pi * x + 0.3)
    cl_bb = 0.05 * cl_ee
    cl_pp = 1e-8 * (ells / 60.) ** -2.5 / (1. + (ell / 700.) ** 2)
    for cl in (cl_tt, cl_ee, cl_te, cl_bb, cl_pp):
        cl[:2] = 0.
    return {'tt': cl_tt, 'ee': cl_ee, 'te': cl_te, 'bb': cl_bb, 'pp': cl_pp}
