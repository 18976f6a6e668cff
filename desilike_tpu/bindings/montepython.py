"""MontePython binding generator (reference bindings/montepython/factory.py).

Host-cosmology injection: MontePython hands the likelihood a classy
instance; external nodes consume its background/pk products per evaluation
(reference montepython/factory.py + base.py:574-598)."""

import numpy as np

from .base import BaseLikelihoodGenerator


def gather_classy_products(cosmo, node):
    """Products from a classy instance (CLASS conventions: H in 1/Mpc,
    distances in Mpc, pk in Mpc^3 vs k in 1/Mpc), converted to h-units."""
    h = float(cosmo.h())
    z = np.asarray(node.z_grid, dtype='f8')
    H0 = float(cosmo.Hubble(0.))
    efunc = np.array([float(cosmo.Hubble(zz)) for zz in z]) / H0
    chi = np.array([float(cosmo.angular_distance(zz)) * (1. + zz) for zz in z]) * h
    products = {'efunc_tab': efunc, 'chi_tab': chi,
                'rs_drag_tab': float(cosmo.rs_drag()) * h}
    kh = np.asarray(node.k_grid, dtype='f8')
    zpk = np.asarray(node.zpk_grid, dtype='f8')
    get_pk_array = getattr(cosmo, 'get_pk_array', None)
    if get_pk_array is not None:
        # classy's batched table getter: karr (nk*nz, k fastest), zarr (nz),
        # returns flat pk of length nz*nk — one C call for the whole table
        nk, nz = len(kh), len(zpk)
        karr = np.tile(kh * h, nz)
        flat = np.asarray(get_pk_array(karr, zpk, nk, nz, 0), dtype='f8')
        pk = flat.reshape(nz, nk) * h ** 3
    else:
        pk = np.array([[float(cosmo.pk_lin(kk * h, zz)) for kk in kh] for zz in zpk]) * h ** 3
    products['pk_tab'] = pk
    s8 = np.array([float(cosmo.sigma(8. / h, zz)) for zz in z])
    f = np.array([float(cosmo.scale_independent_growth_factor_f(zz)) for zz in z])
    products['sigma8_tab'] = s8
    products['fsigma8_tab'] = f * s8
    return products


def inject_from_classy(like, cosmo):
    """Inject the classy instance's cosmology into every external node."""
    for _, node in like.pipeline.external_nodes():
        node.inject(**gather_classy_products(cosmo, node))


def MontePythonLikelihoodFactory(factory, name_like=None, kw_like=None, module=None):
    """Build a MontePython ``Likelihood`` subclass at runtime (reference
    bindings/montepython/factory.py:119) — the programmatic counterpart of
    :class:`MontePythonLikelihoodGenerator`. Sampled parameters are read from
    ``data.mcmc_parameters`` (names with '.' flattened to '_', declared as
    ``use_nuisance``); the classy instance's cosmology is injected into the
    pipeline's external nodes each ``loglkl`` call."""
    from montepython.likelihood_class import Likelihood  # host import at call time
    kw_like = dict(kw_like or {})
    name_like = name_like or getattr(factory, '__name__', 'desilike_tpu_likelihood')

    def __init__(self, path, data, command_line):
        Likelihood.__init__(self, path, data, command_line)
        self._like = factory(**kw_like)
        self._like._compiled_logpost = self._like.logpost_fn()
        self._name_map = {p.name.replace('.', '_'): p.name
                          for p in self._like.pipeline.varied_params}
        self.nuisance = self.use_nuisance = list(self._name_map)

    def loglkl(self, cosmo, data):
        import jax.numpy as jnp
        values = {}
        for key, name in self._name_map.items():
            entry = data.mcmc_parameters[key]
            values[name] = jnp.asarray(entry['current'] * entry['scale'])
        if self._like.pipeline.external_nodes():
            inject_from_classy(self._like, cosmo)
            values.update(self._like.pipeline.external_values())
        lp, aux = self._like._compiled_logpost(values)
        return float(aux['loglikelihood'])

    d = {'__init__': __init__, 'loglkl': loglkl}
    if module is not None:
        d['__module__'] = module
    return type(name_like, (Likelihood,), d)


class MontePythonLikelihoodGenerator(BaseLikelihoodGenerator):
    """Generates a MontePython likelihood module: a Likelihood subclass whose
    loglkl() reads the sampled (nuisance) parameters from data.mcmc_parameters
    and returns the desilike_tpu log-likelihood."""

    def generate(self):
        params = self.varied_params()
        names = [p.name for p in params]
        body = self.header()
        body += (
            '\nfrom montepython.likelihood_class import Likelihood\n\n'
            '_PARAM_NAMES = {names!r}\n\n\n'
            'class desilike_tpu_likelihood(Likelihood):\n\n'
            '    def __init__(self, path, data, command_line):\n'
            '        Likelihood.__init__(self, path, data, command_line)\n'
            '        self._like = _get_like()\n'
            '        for name in _PARAM_NAMES:\n'
            '            key = name.replace(".", "_")\n'
            '            self.use_nuisance = getattr(self, "use_nuisance", [])\n'
            '            if key not in self.use_nuisance:\n'
            '                self.use_nuisance.append(key)\n\n'
            '    def loglkl(self, cosmo, data):\n'
            '        import jax.numpy as jnp\n'
            '        values = {{}}\n'
            '        for name in _PARAM_NAMES:\n'
            '            key = name.replace(".", "_")\n'
            '            entry = data.mcmc_parameters[key]\n'
            '            values[name] = jnp.asarray(entry["current"] * entry["scale"])\n'
            '        lp, aux = self._like._compiled_logpost(values)\n'
            '        return float(aux["loglikelihood"])\n'
        ).format(names=names)
        return body
