"""Cobaya binding generator (reference bindings/cobaya/factory.py).

Host-cosmology injection (reference factory.py:18-99 + base.py:574-598):
when the wrapped pipeline contains an ``engine='external'`` Cosmology node,
the generated likelihood declares cobaya requirements (Hubble, distances,
rdrag, Pk_grid, fsigma8) and injects the provider's products into the node
each evaluation. Products flow through the compiled program as traced
arguments (Pipeline.external_values), so the host varying the cosmology
never retraces."""

import numpy as np

from .base import BaseLikelihoodGenerator


def cobaya_requirements(like):
    """Map the pipeline's cosmo_requires onto cobaya requirement names
    (cobaya conventions: k in 1/Mpc, distances in Mpc)."""
    req = like.pipeline.get_cosmo_requires()
    if not req:
        return {}
    out = {}
    bgq = req.get('background', {})
    if 'efunc' in bgq:
        out['Hubble'] = {'z': np.unique(np.insert(np.asarray(bgq['efunc']['z'], dtype='f8'), 0, 0.))}
    if 'comoving_radial_distance' in bgq:
        out['comoving_radial_distance'] = {'z': np.asarray(bgq['comoving_radial_distance']['z'], dtype='f8')}
    if 'rs_drag' in req.get('thermodynamics', {}):
        out['rdrag'] = None
    fo = req.get('fourier', {})
    if 'pk_interpolator' in fo:
        attrs = fo['pk_interpolator']
        # requirement k_max in 1/Mpc: k_h * h <= k_h for h <= 1, so the
        # h-unit maximum is a safe bound (with margin for h ~ 1)
        out['Pk_grid'] = {'z': np.asarray(attrs['z'], dtype='f8'),
                          'k_max': 1.2 * float(np.max(attrs['k'])),
                          'nonlinear': bool(attrs.get('non_linear', False)),
                          'vars_pairs': [('delta_tot', 'delta_tot')]}
    if 'fsigma8' in fo:
        out['fsigma8'] = {'z': np.asarray(fo['fsigma8']['z'], dtype='f8')}
    if 'sigma8_z' in fo:
        out['sigma8_z'] = {'z': np.asarray(fo['sigma8_z']['z'], dtype='f8')}
    return out


def gather_cobaya_products(provider, node):
    """Fetch the provider's products on the node's grids, converted from
    cobaya conventions (Mpc, 1/Mpc, Mpc^3) to the framework's h-units."""
    z = np.asarray(node.z_grid, dtype='f8')
    H = np.asarray(provider.get_Hubble(z), dtype='f8')
    H0 = float(np.asarray(provider.get_Hubble(np.array([0.])))[0])
    h = H0 / 100.
    products = {'efunc_tab': H / H0,
                'chi_tab': np.asarray(provider.get_comoving_radial_distance(z), dtype='f8') * h,
                'rs_drag_tab': float(provider.get_param('rdrag')) * h,
                'fsigma8_tab': np.asarray(provider.get_fsigma8(z), dtype='f8'),
                'sigma8_tab': np.asarray(provider.get_sigma8_z(z), dtype='f8')}
    kmpc, zpk, pk = provider.get_Pk_grid(var_pair=('delta_tot', 'delta_tot'), nonlinear=False)
    from .base import regrid_pk
    products['pk_tab'] = regrid_pk(np.asarray(kmpc, dtype='f8') / h, zpk,
                                   np.log(np.asarray(pk, dtype='f8') * h ** 3),
                                   node.zpk_grid, node.k_grid)
    return products


def inject_from_cobaya(like, provider):
    """Inject the provider's current cosmology into every external node."""
    for _, node in like.pipeline.external_nodes():
        node.inject(**gather_cobaya_products(provider, node))


def desilike_to_cobaya_params(params):
    """Convert parameters to a cobaya 'params' info dict (reference
    bindings/cobaya/factory.py:392): uniform priors become {min, max}, norm
    priors {dist: norm, loc, scale}; reference distributions and proposals
    carry over. Parameter names have '.' namespacing flattened to '_'
    (cobaya names cannot contain dots)."""
    info = {}
    for p in params:
        entry = {'latex': p.latex}
        prior = p.prior
        if prior is not None:
            if prior.dist == 'uniform' and np.isfinite(prior.limits).all():
                entry['prior'] = {'min': prior.limits[0], 'max': prior.limits[1]}
            elif prior.dist == 'norm':
                entry['prior'] = {'dist': 'norm', 'loc': prior.loc, 'scale': prior.scale}
        ref = p.ref
        if ref is not None and ref.dist == 'norm':
            entry['ref'] = {'dist': 'norm', 'loc': ref.loc, 'scale': ref.scale}
        if p.proposal:
            entry['proposal'] = p.proposal
        info[p.name.replace('.', '_')] = entry
    return info


def CobayaLikelihoodFactory(factory, name_like=None, kw_like=None, module=None,
                            params=None):
    """Build a cobaya ``Likelihood`` subclass at runtime (reference
    bindings/cobaya/factory.py:449) — the programmatic counterpart of
    :class:`CobayaLikelihoodGenerator`, which writes the same wrapper to a
    module file.

    Parameters
    ----------
    factory : callable
        Returns the desilike_tpu likelihood.
    name_like : str, default=None
        Class name (defaults to the factory's ``__name__``).
    kw_like : dict, default=None
        Keyword arguments passed to ``factory``.
    module : str, default=None
        Value for the generated class ``__module__`` (cobaya resolves
        likelihood classes by module path).
    params : bool, default=None
        If true, attach the converted cobaya 'params' block as the class
        ``params`` attribute (cobaya then samples them without an explicit
        info block).
    """
    from cobaya.likelihood import Likelihood  # host import at call time
    kw_like = dict(kw_like or {})
    cache = {}

    def _get_like():
        if 'like' not in cache:
            like = factory(**kw_like)
            like._compiled_logpost = like.logpost_fn()
            cache['like'] = like
        return cache['like']

    def initialize(self):
        self._like = _get_like()
        self._name_map = {p.name.replace('.', '_'): p.name
                          for p in self._like.pipeline.varied_params}

    def get_requirements(self):
        return cobaya_requirements(self._like)

    def logp(self, **params_values):
        import jax.numpy as jnp
        values = {self._name_map[k]: jnp.asarray(v)
                  for k, v in params_values.items() if k in self._name_map}
        if self._like.pipeline.external_nodes():
            inject_from_cobaya(self._like, self.provider)
            values.update(self._like.pipeline.external_values())
        lp, aux = self._like._compiled_logpost(values)
        # cobaya applies priors itself: hand back the bare loglikelihood
        return float(aux['loglikelihood'])

    d = {'initialize': initialize, 'get_requirements': get_requirements,
         'logp': logp}
    if module is not None:
        d['__module__'] = module
    if params:
        d['params'] = desilike_to_cobaya_params(_get_like().pipeline.varied_params)
    name_like = name_like or getattr(factory, '__name__', 'DesilikeTPULikelihood')
    return type(name_like, (Likelihood,), d)


class CobayaLikelihoodGenerator(BaseLikelihoodGenerator):
    """Generates a cobaya Likelihood class module + params info dict.

    The generated likelihood exposes the pipeline's varied parameters as
    cobaya-sampled parameters; loglike = the (already prior-free) Gaussian
    loglikelihood, priors handled by cobaya.
    """

    def params_info(self):
        """Cobaya 'params' block for the varied parameters."""
        return desilike_to_cobaya_params(self.varied_params())

    def generate(self):
        params = self.varied_params()
        names = {p.name.replace('.', '_'): p.name for p in params}
        body = self.header()
        body += (
            '\nfrom cobaya.likelihood import Likelihood\n\n'
            '_NAME_MAP = {names!r}\n\n'
            'PARAMS_INFO = {params!r}\n\n\n'
            'class DesilikeTPULikelihood(Likelihood):\n'
            '    """desilike_tpu likelihood wrapped for cobaya."""\n\n'
            '    params = PARAMS_INFO\n\n'
            '    def initialize(self):\n'
            '        self._like = _get_like()\n\n'
            '    def get_requirements(self):\n'
            '        # host-cosmology products consumed by external nodes\n'
            '        # (reference bindings/cobaya/factory.py:18-99)\n'
            '        from desilike_tpu.bindings.cobaya import cobaya_requirements\n'
            '        return cobaya_requirements(self._like)\n\n'
            '    def logp(self, **params_values):\n'
            '        import jax.numpy as jnp\n'
            '        from desilike_tpu.bindings.cobaya import inject_from_cobaya\n'
            '        values = {{_NAME_MAP[k]: jnp.asarray(v) for k, v in params_values.items()\n'
            '                  if k in _NAME_MAP}}\n'
            '        if self._like.pipeline.external_nodes():\n'
            '            inject_from_cobaya(self._like, self.provider)\n'
            '            values.update(self._like.pipeline.external_values())\n'
            '        lp, aux = self._like._compiled_logpost(values)\n'
            '        # cobaya applies priors itself: hand back the bare loglikelihood\n'
            '        return float(aux["loglikelihood"])\n'
        ).format(names=names, params=self.params_info())
        return body
