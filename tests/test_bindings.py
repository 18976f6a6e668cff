"""Binding generators: generated modules are syntactically valid and
reconstruct the likelihood (reference bindings/tests pattern)."""
import ast
import numpy as np
import pytest


def bao_factory():
    from desilike_tpu.theories import DampedBAOWigglesTracerPowerSpectrumMultipoles
    from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable, BoxFootprint
    from desilike_tpu.likelihoods import ObservablesGaussianLikelihood
    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=(0,), k=np.linspace(0.02, 0.3, 29))
    theory.init.params = {'al*': dict(derived='.marg')}
    obs = TracerPowerSpectrumMultipolesObservable(data={'b1': 2.0}, klim={0: (0.02, 0.3, 0.01)}, theory=theory)
    return ObservablesGaussianLikelihood(observables=[obs], footprints=[BoxFootprint(volume=2e9, nbar=5e-4)])


def test_cobaya_generator(tmp_path):
    from desilike_tpu.bindings import CobayaLikelihoodGenerator
    gen = CobayaLikelihoodGenerator(bao_factory)
    code = gen.generate()
    ast.parse(code)  # valid python
    assert 'class DesilikeTPULikelihood' in code
    info = gen.params_info()
    assert 'qpar' in info and 'prior' in info['qpar']
    fn = gen.write(str(tmp_path / 'cobaya_module.py'))
    assert (tmp_path / 'cobaya_module.py').exists()


def test_cosmosis_generator(tmp_path):
    from desilike_tpu.bindings import CosmoSISLikelihoodGenerator
    gen = CosmoSISLikelihoodGenerator(bao_factory)
    code = gen.generate()
    ast.parse(code)
    assert 'def execute(' in code and 'def setup(' in code


def external_fs_factory():
    """Full-shape likelihood on an external (host-provided) cosmology."""
    from desilike_tpu.theories import DirectPowerSpectrumTemplate, KaiserTracerPowerSpectrumMultipoles
    from desilike_tpu.theories.cosmology import Cosmology
    from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable, BoxFootprint
    from desilike_tpu.likelihoods import ObservablesGaussianLikelihood
    cosmo = Cosmology(engine='external')
    tmpl = DirectPowerSpectrumTemplate(z=1., cosmo=cosmo)
    theory = KaiserTracerPowerSpectrumMultipoles(ells=(0, 2), template=tmpl, mu=6)
    obs = TracerPowerSpectrumMultipolesObservable(data={'b1': 2.0},
                                                  klim={0: (0.02, 0.18, 0.01), 2: (0.02, 0.18, 0.01)},
                                                  theory=theory)
    return ObservablesGaussianLikelihood(observables=[obs],
                                         footprints=[BoxFootprint(volume=2e9, nbar=5e-4)])


class FakeProvider:
    """Cobaya-provider stand-in: EH98 products in COBAYA conventions
    (H in km/s/Mpc, distances in Mpc, k in 1/Mpc, Pk in Mpc^3)."""

    def __init__(self, params=None):
        from desilike_tpu.cosmology import background as bg
        self._bg = bg
        self.p = bg.resolve(dict(params or {}))
        self.h = float(self.p['h'])

    def get_Hubble(self, z):
        return 100. * self.h * np.asarray(self._bg.efunc(self.p, np.asarray(z, dtype='f8')))

    def get_comoving_radial_distance(self, z):
        return np.asarray(self._bg.comoving_radial_distance(self.p, np.asarray(z, dtype='f8'))) / self.h

    def get_param(self, name):
        assert name == 'rdrag'
        return float(self._bg.rs_drag(self.p)) / self.h

    def get_Pk_grid(self, var_pair=('delta_tot', 'delta_tot'), nonlinear=False):
        import jax.numpy as jnp
        from desilike_tpu.cosmology import linear as lin
        kh = np.geomspace(1e-4, 12., 300)
        zs = np.linspace(0., 3., 7)
        pk = np.stack([np.asarray(lin.pk_lin(self.p, jnp.asarray(kh), zz)) for zz in zs])
        return kh * self.h, zs, pk / self.h ** 3

    def get_fsigma8(self, z):
        from desilike_tpu.cosmology import linear as lin
        return np.array([float(self._bg.growth_rate(self.p, zz)) * float(lin.sigma_r(self.p, 8., zz))
                         for zz in np.atleast_1d(z)])

    def get_sigma8_z(self, z):
        from desilike_tpu.cosmology import linear as lin
        return np.array([float(lin.sigma_r(self.p, 8., zz)) for zz in np.atleast_1d(z)])


def test_cobaya_host_cosmology_injection():
    """cosmo_requires flow: requirements declared, provider products injected,
    compiled logp responds to the host cosmology (reference factory.py:18-99)."""
    import jax.numpy as jnp
    from desilike_tpu.bindings.cobaya import (cobaya_requirements, inject_from_cobaya,
                                              gather_cobaya_products)
    like = external_fs_factory()
    req = cobaya_requirements(like)
    assert {'Hubble', 'comoving_radial_distance', 'rdrag', 'Pk_grid', 'fsigma8', 'sigma8_z'} <= set(req)
    assert req['Pk_grid']['nonlinear'] is False and req['Pk_grid']['k_max'] > 1.

    fn = like.logpost_fn()
    pipe = like.pipeline

    def logp(**vals):
        values = {k: jnp.asarray(v) for k, v in vals.items()}
        values.update(pipe.external_values())
        return float(fn(values)[1]['loglikelihood'])

    base = logp(b1=2.0)
    # provider at the node's own fiducial: round-trips units + regridding
    inject_from_cobaya(like, FakeProvider())
    lp_fid = logp(b1=2.0)
    assert abs(lp_fid - base) < 0.5
    # shifted cosmology: worse fit to fiducial-generated data
    shifted = FakeProvider({'h': 0.70, 'omega_cdm': 0.125})
    inject_from_cobaya(like, shifted)
    lp_shift = logp(b1=2.0)
    assert lp_shift < lp_fid - 1.0
    # identical to direct product injection
    node = pipe.external_nodes()[0][1]
    inject_from_cobaya(like, FakeProvider())  # reset
    pipe.set_cosmo_requires(**gather_cobaya_products(shifted, node))
    assert logp(b1=2.0) == pytest.approx(lp_shift, abs=1e-6)


def test_generated_cobaya_module_with_fake_provider(tmp_path, monkeypatch):
    """Execute the FULL generated module against a stub cobaya host."""
    import sys, types
    cob = types.ModuleType('cobaya')
    lik = types.ModuleType('cobaya.likelihood')

    class Likelihood:
        pass

    lik.Likelihood = Likelihood
    cob.likelihood = lik
    monkeypatch.setitem(sys.modules, 'cobaya', cob)
    monkeypatch.setitem(sys.modules, 'cobaya.likelihood', lik)
    from desilike_tpu.bindings import CobayaLikelihoodGenerator
    gen = CobayaLikelihoodGenerator(external_fs_factory)
    ns = {}
    exec(compile(gen.generate(), '<gen>', 'exec'), ns)
    L = ns['DesilikeTPULikelihood']()
    L.initialize()
    assert 'Pk_grid' in L.get_requirements()
    L.provider = FakeProvider({'h': 0.70})
    lp1 = L.logp(b1=2.0)
    L.provider = FakeProvider()
    lp0 = L.logp(b1=2.0)
    assert np.isfinite(lp0) and np.isfinite(lp1) and lp0 > lp1


def test_generated_logic_without_host(tmp_path):
    """Execute the generated module's factory path without cobaya installed."""
    from desilike_tpu.bindings import CobayaLikelihoodGenerator
    gen = CobayaLikelihoodGenerator(bao_factory)
    code = gen.generate()
    # strip the cobaya import and class (host absent); keep the factory plumbing
    head = code.split('from cobaya.likelihood')[0]
    ns = {}
    exec(compile(head, '<gen>', 'exec'), ns)
    like = ns['_get_like']()
    import jax.numpy as jnp
    lp, aux = like._compiled_logpost({'qpar': jnp.asarray(1.0), 'qper': jnp.asarray(1.0),
                                      'b1': jnp.asarray(2.0), 'dbeta': jnp.asarray(1.0)})
    assert np.isfinite(float(aux['loglikelihood']))


class FakeBlock:
    """cosmosis datablock stand-in built from EH98 (cosmosis conventions:
    distances in Mpc, H in 1/Mpc (c=1), matter_power_lin in h-units)."""

    C_KMS = 299792.458

    def __init__(self, params=None):
        import jax.numpy as jnp
        from desilike_tpu.cosmology import background as bg, linear as lin
        p = bg.resolve(dict(params or {}))
        h = float(p['h'])
        zb = np.linspace(0., 4.5, 60)
        kh = np.geomspace(1e-4, 12., 300)
        zpk = np.linspace(0., 3., 7)
        self._d = {
            ('cosmological_parameters', 'h0'): h,
            ('distances', 'z'): zb,
            ('distances', 'h'): 100. * h * np.asarray(bg.efunc(p, zb)) / self.C_KMS,
            ('distances', 'd_m'): np.asarray(bg.comoving_angular_distance(p, zb)) / h,
            ('distances', 'rs_zdrag'): float(bg.rs_drag(p)) / h,
            ('matter_power_lin', 'k_h'): kh,
            ('matter_power_lin', 'z'): zpk,
            ('matter_power_lin', 'p_k'): np.stack(
                [np.asarray(lin.pk_lin(p, jnp.asarray(kh), zz)) for zz in zpk]),
        }

    def __getitem__(self, key):
        return self._d[key]

    def __setitem__(self, key, value):
        self._d[key] = value

    def has_value(self, section, name):
        return (section, name) in self._d


def test_cosmosis_host_cosmology_injection():
    """inject_from_cosmosis: datablock products (incl. the growth-from-pk
    fallback) drive the external node like the cobaya provider does."""
    import jax.numpy as jnp
    from desilike_tpu.bindings.cosmosis import inject_from_cosmosis
    like = external_fs_factory()
    fn = like.logpost_fn()
    pipe = like.pipeline

    def logp(**vals):
        values = {k: jnp.asarray(v) for k, v in vals.items()}
        values.update(pipe.external_values())
        return float(fn(values)[1]['loglikelihood'])

    inject_from_cosmosis(like, FakeBlock())
    lp_fid = logp(b1=2.0)
    node = pipe.external_nodes()[0][1]
    # growth fallback is close to the EH98 truth
    from desilike_tpu.cosmology import background as bg, linear as lin
    p = bg.resolve({})
    assert node.sigma8_tab[0] == pytest.approx(float(lin.sigma_r(p, 8., 0.)), rel=0.01)
    f_true = float(bg.growth_rate(p, 1.))
    i1 = np.argmin(np.abs(node.z_grid - 1.))
    assert node.fsigma8_tab[i1] / node.sigma8_tab[i1] == pytest.approx(f_true, rel=0.05)
    inject_from_cosmosis(like, FakeBlock({'h': 0.70, 'omega_cdm': 0.125}))
    lp_shift = logp(b1=2.0)
    assert np.isfinite(lp_fid) and np.isfinite(lp_shift) and lp_shift < lp_fid - 1.0


class FakeClassy:
    """classy stand-in built from EH98 (CLASS conventions)."""

    C_KMS = 299792.458

    def __init__(self, params=None):
        from desilike_tpu.cosmology import background as bg, linear as lin
        self._bg, self._lin = bg, lin
        self.p = bg.resolve(dict(params or {}))
        self._h = float(self.p['h'])

    def h(self):
        return self._h

    def Hubble(self, z):
        return 100. * self._h * float(self._bg.efunc(self.p, z)) / self.C_KMS

    def angular_distance(self, z):
        return float(self._bg.comoving_angular_distance(self.p, z)) / self._h / (1. + z)

    def rs_drag(self):
        return float(self._bg.rs_drag(self.p)) / self._h

    def pk_lin(self, k_mpc, z):
        import jax.numpy as jnp
        return float(self._lin.pk_lin(self.p, jnp.asarray([k_mpc / self._h]), z)[0]) / self._h ** 3

    def get_pk_array(self, karr_mpc, zarr, nk, nz, nonlinear):
        """classy's batched pk table getter (k fastest, flat nz*nk result) —
        one vectorized evaluation per z instead of nz*nk scalar dispatches."""
        import jax.numpy as jnp
        kh = jnp.asarray(np.asarray(karr_mpc[:nk], dtype='f8') / self._h)
        rows = [np.asarray(self._lin.pk_lin(self.p, kh, float(zz))) for zz in np.asarray(zarr)]
        return (np.concatenate(rows) / self._h ** 3).astype('f8')

    def _growth_tables(self):
        # one batched evaluation over z instead of per-call ODE re-runs
        if not hasattr(self, '_ztab'):
            import jax.numpy as jnp
            self._ztab = np.linspace(0., 5., 101)
            self._Dtab = np.asarray(self._bg.growth_factor(self.p, jnp.asarray(self._ztab)))
            self._ftab = np.asarray(self._bg.growth_rate(self.p, jnp.asarray(self._ztab)))
            self._s8_z0 = {}
        return self._ztab, self._Dtab, self._ftab

    def sigma(self, R_mpc, z):
        ztab, Dtab, _ = self._growth_tables()
        R = float(R_mpc) * self._h
        if R not in self._s8_z0:
            self._s8_z0[R] = float(self._lin.sigma_r(self.p, R, 0.))
        return self._s8_z0[R] * float(np.interp(z, ztab, Dtab)) / float(Dtab[0])

    def scale_independent_growth_factor_f(self, z):
        ztab, _, ftab = self._growth_tables()
        return float(np.interp(z, ztab, ftab))


def test_montepython_host_cosmology_injection():
    import jax.numpy as jnp
    from desilike_tpu.bindings.montepython import inject_from_classy
    like = external_fs_factory()
    fn = like.logpost_fn()
    pipe = like.pipeline

    def logp(**vals):
        values = {k: jnp.asarray(v) for k, v in vals.items()}
        values.update(pipe.external_values())
        return float(fn(values)[1]['loglikelihood'])

    inject_from_classy(like, FakeClassy())
    lp_fid = logp(b1=2.0)
    inject_from_classy(like, FakeClassy({'h': 0.70, 'omega_cdm': 0.125}))
    lp_shift = logp(b1=2.0)
    assert np.isfinite(lp_fid) and np.isfinite(lp_shift) and lp_shift < lp_fid - 1.0


def test_cobaya_factory(monkeypatch):
    """CobayaLikelihoodFactory (reference cobaya/factory.py:449): builds the
    Likelihood class at runtime, params=True attaches the converted info,
    logp responds to the injected provider cosmology."""
    import sys, types
    cob = types.ModuleType('cobaya')
    lik = types.ModuleType('cobaya.likelihood')

    class Likelihood:
        pass

    lik.Likelihood = Likelihood
    cob.likelihood = lik
    monkeypatch.setitem(sys.modules, 'cobaya', cob)
    monkeypatch.setitem(sys.modules, 'cobaya.likelihood', lik)
    from desilike_tpu.bindings import CobayaLikelihoodFactory
    cls = CobayaLikelihoodFactory(external_fs_factory, params=True, module='my.bindings')
    assert cls.__name__ == 'external_fs_factory' and cls.__module__ == 'my.bindings'
    assert 'b1' in cls.params and 'prior' in cls.params['b1']
    L = cls()
    L.initialize()
    assert 'Pk_grid' in L.get_requirements()
    L.provider = FakeProvider()
    lp0 = L.logp(b1=2.0)
    L.provider = FakeProvider({'h': 0.70, 'omega_cdm': 0.125})
    lp1 = L.logp(b1=2.0)
    assert np.isfinite(lp0) and np.isfinite(lp1) and lp0 > lp1


def test_desilike_to_cobaya_params():
    from desilike_tpu.bindings import desilike_to_cobaya_params
    like = bao_factory()
    info = desilike_to_cobaya_params(like.pipeline.varied_params)
    assert 'qpar' in info and info['qpar']['prior']['min'] > 0.


def test_cosmosis_factory():
    """CosmoSISLikelihoodFactory (reference cosmosis/factory.py:119): the
    setup/execute/cleanup triple runs against a fake datablock, injects the
    block cosmology, and writes the likelihood entry."""
    from desilike_tpu.bindings import CosmoSISLikelihoodFactory
    cls = CosmoSISLikelihoodFactory(external_fs_factory, name_like='my_fs')
    setup, execute, cleanup = cls.build_module()
    calc = setup(None)
    values = {p.name.replace('.', '_'): (2.0 if p.basename == 'b1' else p.value)
              for p in calc.like.pipeline.varied_params}
    block = FakeBlock()
    for key, val in values.items():
        block['desilike_tpu_params', key] = val
    assert execute(block, calc) == 0
    lp_fid = block['likelihoods', 'my_fs_like']
    shifted = FakeBlock({'h': 0.70, 'omega_cdm': 0.125})
    for key, val in values.items():
        shifted['desilike_tpu_params', key] = val
    execute(shifted, calc)
    lp_shift = shifted['likelihoods', 'my_fs_like']
    assert np.isfinite(lp_fid) and np.isfinite(lp_shift) and lp_shift < lp_fid - 1.0
    assert cleanup(calc) == 0


def test_montepython_factory(monkeypatch):
    """MontePythonLikelihoodFactory (reference montepython/factory.py:119):
    loglkl reads data.mcmc_parameters and injects the classy cosmology."""
    import sys, types
    mp = types.ModuleType('montepython')
    lc = types.ModuleType('montepython.likelihood_class')

    class Likelihood:
        def __init__(self, path, data, command_line):
            pass

    lc.Likelihood = Likelihood
    mp.likelihood_class = lc
    monkeypatch.setitem(sys.modules, 'montepython', mp)
    monkeypatch.setitem(sys.modules, 'montepython.likelihood_class', lc)
    from desilike_tpu.bindings import MontePythonLikelihoodFactory
    cls = MontePythonLikelihoodFactory(external_fs_factory)
    L = cls(None, None, None)
    assert 'b1' in L.use_nuisance

    class Data:
        mcmc_parameters = {p.name.replace('.', '_'):
                           {'current': 2.0 if p.basename == 'b1' else p.value, 'scale': 1.0}
                           for p in L._like.pipeline.varied_params}

    lp_fid = L.loglkl(FakeClassy(), Data())
    lp_shift = L.loglkl(FakeClassy({'h': 0.70, 'omega_cdm': 0.125}), Data())
    assert np.isfinite(lp_fid) and np.isfinite(lp_shift) and lp_shift < lp_fid - 1.0
