"""Cosmology calculator node: the differentiable Boltzmann-lite backend.

Counterpart of the reference's ``Cosmoprimo`` node
(theories/primordial_cosmology.py:78), which wraps CLASS/CAMB. Engines, in
decreasing accuracy for standalone direct-cosmology fits:

- ``'emulator'`` — the production standalone path: a trained MLP correction
  to EH98 (cosmology/emulator.py) delivering Boltzmann-quality linear pk
  and rs_drag, differentiable end to end;
- ``'table'`` — an injected Boltzmann pk at the fiducial cosmology with
  exact+EH98-ratio parameter response (best when sampling near fiducial);
- ``'external'`` — per-evaluation host-code products (bindings);
- ``'eh98'`` / ``'eh99'`` — clearly-approximate (few-percent transfer
  function) self-contained fallbacks; eh99 adds the massive-neutrino
  free-streaming suppression (astro-ph/9710252).
"""

import numpy as np
import jax.numpy as jnp

from ..core import Calculator
from ..cosmology import background as bg
from ..cosmology import linear as lin


_COSMO_PARAM_DEFAULTS = {
    'h': dict(value=0.6736, prior=dict(limits=[0.1, 1.]), ref=dict(dist='norm', loc=0.6736, scale=0.005), latex='h'),
    'omega_cdm': dict(value=0.1200, prior=dict(limits=[0.01, 0.99]), ref=dict(dist='norm', loc=0.12, scale=0.001), latex=r'\omega_{cdm}'),
    'omega_b': dict(value=0.02237, prior=dict(limits=[0.005, 0.1]), ref=dict(dist='norm', loc=0.02237, scale=0.0002), latex=r'\omega_{b}'),
    'logA': dict(value=3.036394, prior=dict(limits=[1.61, 3.91]), ref=dict(dist='norm', loc=3.036, scale=0.01), latex=r'\ln(10^{10} A_s)'),
    'n_s': dict(value=0.9649, prior=dict(limits=[0.8, 1.2]), ref=dict(dist='norm', loc=0.9649, scale=0.004), latex='n_s'),
    'tau_reio': dict(value=0.0544, prior=dict(limits=[0.01, 0.8]), latex=r'\tau'),
    'm_ncdm': dict(value=0.06, prior=dict(limits=[0., 5.]), latex=r'\sum m_\nu'),
    'N_ur': dict(value=2.0328, latex='N_{ur}'),
    'Omega_k': dict(value=0., prior=dict(limits=[-0.3, 0.3]), latex=r'\Omega_k'),
    'w0_fde': dict(value=-1., prior=dict(limits=[-3., 1.]), latex='w_0'),
    'wa_fde': dict(value=0., prior=dict(limits=[-3., 2.]), latex='w_a'),
}


def get_from(obj, name, z=None):
    """Uniform quantity access used by templates/extractors."""
    fn = getattr(obj, name)
    return fn(z) if z is not None else fn()


class Cosmology(Calculator):
    _propagate_namespace = False  # one cosmology is typically shared across tracers
    """Differentiable cosmology node. All parameters fixed by default; vary a
    subset via ``init.params`` or ``params['h'].update(fixed=False)``.

    Exposes: efunc(z), comoving_angular_distance(z), hubble_distance(z),
    rs_drag(), growth_rate(z), growth_factor(z), pk_dd(k, z), pk_dd_now(k, z),
    sigma_r(r, z), sigma8(z), fsigma8(z).
    """

    @staticmethod
    def _params(init):
        fixed = init.get('fixed', True)
        theta = bool(init.get('theta', False))

        def is_fixed(name):
            return True if fixed is True else (name in fixed if hasattr(fixed, '__contains__') else bool(fixed))

        params = {}
        for name, cfg in _COSMO_PARAM_DEFAULTS.items():
            if theta and name == 'h':
                continue
            cfg = dict(cfg)
            cfg['fixed'] = is_fixed(name)
            params[name] = cfg
        if theta:
            # CosmoMC-style sound-horizon-angle parameterization: h is solved
            # from 100 theta_* each evaluation (reference
            # primordial_cosmology.py:60-74)
            params['theta_MC_100'] = dict(value=1.04109, prior=dict(limits=[0.9, 1.2]),
                                          ref=dict(dist='norm', loc=1.04109, scale=0.0005),
                                          fixed=is_fixed('theta_MC_100') and is_fixed('h'),
                                          latex=r'100\theta_\mathrm{MC}')
            params['h'] = dict(derived=True, latex='h')
        return params

    def initialize(self, fiducial=None, fixed=True, engine='eh98', pk_table=None,
                   z_grid=None, k_grid=None, zpk_grid=None, theta=False, emulator=None):
        base = dict(bg.DEFAULT_PARAMS)
        if fiducial:
            base.update(fiducial)
        self.fiducial_values = base
        self._use_theta = bool(theta)
        self.engine = str(engine)
        if self.engine not in ('eh98', 'eh99', 'table', 'external', 'emulator'):
            raise ValueError("engine must be 'eh98'/'eh99' (approximate few-percent "
                             'transfer functions, self-contained), '
                             "'emulator' (trained Boltzmann-correction MLP — the "
                             'Boltzmann-quality standalone path, see '
                             'cosmology/emulator.py), '
                             "'table' (injected Boltzmann pk, fiducial-pinned response) or "
                             "'external' (per-evaluation host-code products, bindings)")
        if self.engine == 'emulator':
            from ..cosmology import emulator as emu
            if emulator is None:
                raise ValueError("engine='emulator' needs emulator=<weights dict or "
                                 '.npz path from cosmology.emulator.train_pk_emulator>')
            self._emu_weights = emu.load_weights(emulator) if isinstance(emulator, (str,)) \
                or hasattr(emulator, '__fspath__') else emulator
            missing = [n for n in self._emu_weights['param_names'] if n not in base]
            if missing:
                raise ValueError('emulator expects unknown parameters {}'.format(missing))
            # static no-wiggle companion: Gaussian ln-k smoothing of the
            # predicted ln-ratio removes its residual BAO-phase wiggles
            self._emu_smooth = lin.smoothing_matrix(np.log(np.asarray(self._emu_weights['k_grid'])))
        if self.engine == 'table':
            if pk_table is None:
                raise ValueError("engine='table' needs pk_table=(k, pk) at z=0 from a "
                                 'Boltzmann code at the fiducial cosmology')
            ktab, pktab = (np.asarray(v, dtype='f8') for v in pk_table)
            self._lnk_tab, self._lnpk_tab = np.log(ktab), np.log(pktab)
            self._p_fid = bg.resolve(dict(base))
            self._alpha_nw = lin.table_nowiggle_amplitude(self._p_fid, self._lnk_tab, self._lnpk_tab)
        if self.engine == 'external':
            self._init_external(z_grid, k_grid, zpk_grid)

    def _init_external(self, z_grid, k_grid, zpk_grid):
        """Host-cosmology shim (reference cosmo.py:37 ExternalEngine +
        base.py:574 cosmo_requires): quantities are read from tables on
        fixed grids. Tables are injected per evaluation (``inject``) and
        flow through compiled programs as traced arguments (see
        Pipeline.external_values), so a host sampler varying the cosmology
        never triggers retracing. Filled with EH98 fiducial values at init
        so the node evaluates before the first injection. All quantities in
        h-units (k [h/Mpc], pk [(Mpc/h)^3], distances [Mpc/h])."""
        import jax.numpy as jnp_
        self.z_grid = np.asarray(z_grid if z_grid is not None else np.linspace(0., 4., 65), dtype='f8')
        self.k_grid = np.asarray(k_grid if k_grid is not None else np.geomspace(1e-4, 10., 256), dtype='f8')
        self.zpk_grid = np.asarray(zpk_grid if zpk_grid is not None else np.linspace(0., 3., 13), dtype='f8')
        p = bg.resolve(dict(self.fiducial_values))
        self.efunc_tab = np.asarray(bg.efunc(p, self.z_grid), dtype='f8')
        self.chi_tab = np.asarray(bg.comoving_radial_distance(p, self.z_grid), dtype='f8')
        self.rs_drag_tab = np.asarray(bg.rs_drag(p), dtype='f8')
        self.pk_tab = np.stack([np.asarray(lin.pk_lin(p, jnp_.asarray(self.k_grid), zz), dtype='f8')
                                for zz in self.zpk_grid])
        s8 = np.array([float(lin.sigma_r(p, 8., zz)) for zz in self.z_grid])
        self.sigma8_tab = s8
        self.fsigma8_tab = np.asarray(bg.growth_rate(p, self.z_grid), dtype='f8') * s8
        self._external_attrs = ('efunc_tab', 'chi_tab', 'rs_drag_tab', 'pk_tab',
                                'fsigma8_tab', 'sigma8_tab')
        self.cosmo_requires = {
            'background': {'efunc': {'z': self.z_grid},
                           'comoving_radial_distance': {'z': self.z_grid}},
            'thermodynamics': {'rs_drag': None},
            'fourier': {'pk_interpolator': {'k': self.k_grid, 'z': self.zpk_grid,
                                            'of': [('delta_m', 'delta_m')], 'non_linear': False},
                        'fsigma8': {'z': self.z_grid},
                        'sigma8_z': {'z': self.z_grid}},
        }

    def inject(self, **arrays):
        """Set external tables (host-side numpy). Keys: efunc_tab, chi_tab,
        rs_drag_tab, pk_tab, fsigma8_tab, sigma8_tab — shapes must match the
        node's grids (fixed at initialization, so compiled programs never
        retrace)."""
        if self.engine != 'external':
            raise ValueError("inject() requires engine='external'")
        for name, value in arrays.items():
            if name not in self._external_attrs:
                raise ValueError('unknown external quantity {}; expected {}'.format(name, self._external_attrs))
            value = np.asarray(value, dtype='f8')
            expected = np.shape(getattr(self, name))
            if value.shape != expected:
                raise ValueError('{} shape {} != grid shape {}'.format(name, value.shape, expected))
            setattr(self, name, value)

    def calculate(self, **params):
        p = dict(self.fiducial_values)
        p.update({k: v for k, v in params.items() if k in p or k in ('A_s', 'alpha_s')})
        # alternative input parameterizations, per the reference/cosmoprimo
        # conventions (ref power_template.yaml declares Omega_m/N_eff/
        # w0_fld/wa_fld on the extractors; cosmoprimo converts internally):
        # w0_fld/wa_fld are the CLASS names of our w0_fde/wa_fde; N_eff is
        # total radiation (N_ur + N_ncdm contributions); Omega_m overrides
        # omega_cdm given h, omega_b and the neutrino density.
        if 'w0_fld' in params:
            p['w0_fde'] = params['w0_fld']
        if 'wa_fld' in params:
            p['wa_fde'] = params['wa_fld']
        if 'N_eff' in params:
            p['N_ur'] = params['N_eff'] - p.get('N_ncdm', 1) * TNCDM_NEFF
        if 'Omega_m' in params:
            p['omega_cdm'] = (params['Omega_m'] * p['h'] ** 2 - p['omega_b']
                              - p['m_ncdm'] * bg.NEUTRINO_MASS_TO_OMEGA)
        if self._use_theta and 'theta_MC_100' in params:
            # solve h from 100 theta_* by Newton with AD derivatives
            # (differentiable end to end; theta_* is smooth and monotone in h).
            # Iterates are clipped to the physical box so far-from-fiducial
            # targets cannot send Newton off to negative h, and the result is
            # guarded: an unconverged solve returns NaN, which the likelihood
            # error policy maps to -inf rather than silently polluting the
            # pipeline with a wrong h.
            import jax
            target = jnp.asarray(params['theta_MC_100'], dtype=jnp.result_type(float))

            def theta_fn(h):
                return bg.theta_star_100(bg.resolve({**p, 'h': h}))

            h = jnp.asarray(p['h'], dtype=target.dtype)
            for _ in range(8):
                val, dval = jax.value_and_grad(theta_fn)(h)
                h = jnp.clip(h - (val - target) / dval, 0.05, 1.5)
            residual = theta_fn(h) - target
            h = jnp.where(jnp.abs(residual) < 1e-6 * target, h, jnp.nan)
            p['h'] = h
            self.h = h
        self.p = bg.resolve(p)
        if self.engine == 'emulator':
            from ..cosmology import emulator as emu
            theta = jnp.stack([jnp.asarray(self.p[name], dtype=jnp.result_type(float))
                               for name in self._emu_weights['param_names']])
            self._emu_lnr, self._emu_rs_ratio = emu.predict_tables(self._emu_weights, theta)
            self._emu_lnr_smooth = self._emu_lnr @ jnp.asarray(self._emu_smooth).T

    # --- emulator-engine helpers ---

    def _emu_z_bracket(self, z):
        zg = jnp.asarray(self._emu_weights['z_grid'])
        z = jnp.asarray(z)
        iz = jnp.clip(jnp.searchsorted(zg, z) - 1, 0, len(zg) - 2)
        t = jnp.clip((z - zg[iz]) / (zg[iz + 1] - zg[iz]), 0., 1.)
        return zg, iz, t

    def _emu_lnratio_at(self, table, k, z):
        """Bilinear: rows linear in z, ln k within; edge-clamped outside."""
        _, iz, t = self._emu_z_bracket(z)
        row = (1. - t) * table[iz] + t * table[iz + 1]
        lnk_grid = jnp.log(jnp.asarray(self._emu_weights['k_grid']))
        return jnp.interp(jnp.log(jnp.asarray(k)), lnk_grid, row)

    # --- background ---

    def efunc(self, z):
        if self.engine == 'external':
            return jnp.interp(jnp.asarray(z), jnp.asarray(self.z_grid), jnp.asarray(self.efunc_tab))
        return bg.efunc(self.p, z)

    def comoving_angular_distance(self, z):
        if self.engine == 'external':
            # flat geometry: the host shim carries the radial distance only
            return self.comoving_radial_distance(z)
        return bg.comoving_angular_distance(self.p, z)

    def comoving_radial_distance(self, z):
        if self.engine == 'external':
            return jnp.interp(jnp.asarray(z), jnp.asarray(self.z_grid), jnp.asarray(self.chi_tab))
        return bg.comoving_radial_distance(self.p, z)

    def hubble_distance(self, z):
        return bg.DH_100 / self.efunc(z)

    def rs_drag(self):
        if self.engine == 'external':
            return jnp.asarray(self.rs_drag_tab)
        if self.engine == 'emulator':
            return bg.rs_drag(self.p) * self._emu_rs_ratio
        return bg.rs_drag(self.p)

    @property
    def N_eff(self):
        return self.p['N_ur'] + self.p.get('N_ncdm', 1) * TNCDM_NEFF

    # --- growth & fourier ---

    def growth_rate(self, z):
        if self.engine == 'external':
            return self.fsigma8(z) / self.sigma8(z)
        return bg.growth_rate(self.p, z)

    def growth_factor(self, z):
        if self.engine == 'external':
            return self.sigma8(z) / self.sigma8(0.)
        return bg.growth_factor(self.p, z)

    def _pk_external(self, k, z):
        """Log-log interpolation of the injected (nzpk, nk) table; z scalar."""
        lnpk = jnp.log(jnp.asarray(self.pk_tab))
        zg = jnp.asarray(self.zpk_grid)
        z = jnp.asarray(z)
        iz = jnp.clip(jnp.searchsorted(zg, z) - 1, 0, len(self.zpk_grid) - 2)
        t = jnp.clip((z - zg[iz]) / (zg[iz + 1] - zg[iz]), 0., 1.)
        row = (1. - t) * lnpk[iz] + t * lnpk[iz + 1]
        return jnp.exp(jnp.interp(jnp.log(jnp.asarray(k)), jnp.log(jnp.asarray(self.k_grid)), row))

    def growth_rate_k(self, k, z):
        """Scale-dependent growth rate f(k, z); flat except for the eh99
        engine, where massive-neutrino free-streaming suppresses it
        (EH99 eq. 11 logarithmic derivative)."""
        f = self.growth_rate(z)
        if self.engine == 'eh99':
            from ..cosmology import eh
            return f * eh.growth_rate_ratio(self.p, k, z)
        if self.engine == 'emulator':
            # the ratio table carries the scale-dependent growth:
            # f(k,z) = f_bg(z) + dln sqrt(r)/dln a = f_bg - (1+z)/2 dln r/dz,
            # with the z-derivative from the table's piecewise-linear slope
            zg, iz, _ = self._emu_z_bracket(z)
            slope_rows = (self._emu_lnr[iz + 1] - self._emu_lnr[iz]) / (zg[iz + 1] - zg[iz])
            lnk_grid = jnp.log(jnp.asarray(self._emu_weights['k_grid']))
            slope = jnp.interp(jnp.log(jnp.asarray(k)), lnk_grid, slope_rows)
            return f - 0.5 * (1. + jnp.asarray(z)) * slope
        return f * jnp.ones(jnp.asarray(k).shape)

    def pk_dd(self, k, z):
        if self.engine == 'table':
            return lin.pk_lin_table(self.p, self._p_fid, self._lnk_tab, self._lnpk_tab, k, z)
        if self.engine == 'external':
            return self._pk_external(k, z)
        if self.engine == 'emulator':
            return lin.pk_lin(self.p, k, z) * jnp.exp(self._emu_lnratio_at(self._emu_lnr, k, z))
        if self.engine == 'eh99':
            from ..cosmology import eh
            return lin.pk_lin(self.p, k, z) * eh.neutrino_ratio(self.p, k, z)
        return lin.pk_lin(self.p, k, z)

    def pk_dd_now(self, k, z):
        if self.engine == 'table':
            # same response algebra as pk_lin_table; smooth EH98 shape scaled
            # to the injected table's normalization
            return self._alpha_nw * lin.pk_lin(self.p, k, z, nowiggle=True)
        if self.engine == 'external':
            # smooth EH98 shape amplitude-matched to the injected table
            # (a no-wiggle reference for wiggle-split filters)
            alpha = (self.sigma8(z) / lin.sigma_r(self.p, 8., z)) ** 2
            return alpha * lin.pk_lin(self.p, k, z, nowiggle=True)
        if self.engine == 'emulator':
            # ln-k-smoothed ratio: broadband correction without re-importing
            # the truth table's residual BAO-phase wiggles
            return (lin.pk_lin(self.p, k, z, nowiggle=True)
                    * jnp.exp(self._emu_lnratio_at(self._emu_lnr_smooth, k, z)))
        if self.engine == 'eh99':
            from ..cosmology import eh
            return lin.pk_lin(self.p, k, z, nowiggle=True) * eh.neutrino_ratio(self.p, k, z)
        return lin.pk_lin(self.p, k, z, nowiggle=True)

    def sigma_r(self, r, z=0.):
        if self.engine == 'table':
            return lin.sigma_r(self.p, r, z, pk_func=lambda k: lin.pk_lin_table(
                self.p, self._p_fid, self._lnk_tab, self._lnpk_tab, k, z))
        if self.engine == 'external':
            return lin.sigma_r(self.p, r, z, pk_func=lambda k: self._pk_external(k, z))
        if self.engine in ('eh99', 'emulator'):
            return lin.sigma_r(self.p, r, z, pk_func=lambda k: self.pk_dd(k, z))
        return lin.sigma_r(self.p, r, z)

    def sigma8(self, z=0.):
        if self.engine == 'external':
            return jnp.interp(jnp.asarray(z), jnp.asarray(self.z_grid), jnp.asarray(self.sigma8_tab))
        # via sigma_r so the table/eh99 engines stay consistent with pk_dd
        return self.sigma_r(8., z)

    def fsigma8(self, z=0.):
        if self.engine == 'external':
            return jnp.interp(jnp.asarray(z), jnp.asarray(self.z_grid), jnp.asarray(self.fsigma8_tab))
        return self.growth_rate(z) * self.sigma8(z)

    def get(self):
        return self


TNCDM_NEFF = (bg.TNCDM / (4. / 11.) ** (1. / 3.)) ** 4
