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
    center : dict, default=None
        Expansion point for ``derivatives``.
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
        for name in (init.get('derivatives') or {}):
            params[name] = dict(value=float(center.get(name, 0.)),
                                prior=dict(limits=[-np.inf, np.inf]),
                                delta=0.01, latex=name.replace('_', r'\_'))
        return params

    def initialize(self, cls=None, tables=None, derivatives=None, center=None,
                   unit=None, T0=2.7255, lensing=None, non_linear=None):
        self.requested_cls = dict(cls or {})
        for xy in self.requested_cls:
            if xy not in ALLOWED_CLS:
                raise ValueError('unknown Cl {}; allowed: {}'.format(xy, ALLOWED_CLS))
        if unit not in (None, 'muK'):
            raise ValueError("unit must be None or 'muK'")
        self.unit = unit
        self.T0 = float(T0)
        if tables is None:
            raise ValueError(
                'ClTheory needs injected C_ell tables: the in-framework EH98 backend has no '
                'Boltzmann hierarchy. Compute the tables once with CLASS/CAMB and pass '
                "tables={'tt': cl_tt, ...} (+ optional derivatives= for a differentiable "
                'first-order response), or use the binding layer to source them from a host code.')
        self._tables = {k: np.asarray(v, dtype='f8') for k, v in tables.items()}
        self._derivs = {name: {k: np.asarray(v, dtype='f8') for k, v in tabs.items()}
                        for name, tabs in (derivatives or {}).items()}
        self._center = {name: float((center or {}).get(name, 0.)) for name in self._derivs}

        def prepare(tab, ellmax):
            out = np.zeros(ellmax + 1)
            n = min(ellmax + 1, len(tab))
            out[:n] = tab[:n]
            return out

        self._base, self._resp = {}, {}
        for xy, ellmax in self.requested_cls.items():
            ellmax = int(ellmax)
            if xy in ('tb', 'eb') and xy not in self._tables:
                self._base[xy] = np.zeros(ellmax + 1)
            else:
                if xy not in self._tables:
                    raise ValueError('no table injected for requested Cl {}'.format(xy))
                self._base[xy] = prepare(self._tables[xy], ellmax)
            unit_factor = 1.
            if self.unit == 'muK':
                unit_factor = (self.T0 * 1e6) ** (2 - xy.count('p'))
            self._base[xy] = self._base[xy] * unit_factor
            for name, tabs in self._derivs.items():
                if xy in tabs:
                    self._resp.setdefault(name, {})[xy] = prepare(tabs[xy], ellmax) * unit_factor

    def calculate(self, **params):
        cls = {xy: jnp.asarray(base) for xy, base in self._base.items()}
        for name, tabs in self._resp.items():
            delta = jnp.asarray(params.get(name, self._center[name])) - self._center[name]
            for xy, dtab in tabs.items():
                cls[xy] = cls[xy] + delta * jnp.asarray(dtab)
        self.cls = cls

    def get(self):
        return self.cls


def synthetic_cl_tables(lmax=2600, seed=None):
    """Smooth CMB-like C_ell fixture (damped acoustic oscillations) for tests
    and examples — NOT a Boltzmann computation. Raw (dimensionless) units.
    Returns dict with tt, ee, te, bb, pp."""
    ell = np.arange(lmax + 1).astype('f8')
    ells = np.maximum(ell, 1.)
    # acoustic envelope: Dl_tt ~ plateau * oscillations * damping
    x = ell / 220.
    osc = 1. + 0.6 * np.cos(np.pi * x) * np.exp(-ell / 1600.)
    damp = np.exp(-(ell / 1200.) ** 1.4)
    dl_tt = 1e-10 * (5.e3 * (ells / 200.) ** 0.04 * osc * damp + 1.e3 * np.exp(-ell / 80.))
    cl_tt = 2. * np.pi * dl_tt / (ells * (ells + 1.))
    cl_ee = 0.04 * cl_tt * (1. + 0.8 * np.sin(np.pi * x)) ** 2
    cl_te = 0.35 * np.sqrt(np.abs(cl_tt * cl_ee)) * np.cos(np.pi * x + 0.3)
    cl_bb = 0.05 * cl_ee
    cl_pp = 1e-8 * (ells / 60.) ** -2.5 / (1. + (ell / 700.) ** 2)
    for cl in (cl_tt, cl_ee, cl_te, cl_bb, cl_pp):
        cl[:2] = 0.
    return {'tt': cl_tt, 'ee': cl_ee, 'te': cl_te, 'bb': cl_bb, 'pp': cl_pp}
