"""Cobaya binding generator (reference bindings/cobaya/factory.py)."""

import numpy as np

from .base import BaseLikelihoodGenerator


class CobayaLikelihoodGenerator(BaseLikelihoodGenerator):
    """Generates a cobaya Likelihood class module + params info dict.

    The generated likelihood exposes the pipeline's varied parameters as
    cobaya-sampled parameters; loglike = the (already prior-free) Gaussian
    loglikelihood, priors handled by cobaya.
    """

    def params_info(self):
        """Cobaya 'params' block for the varied parameters."""
        info = {}
        for p in self.varied_params():
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
            '        return {{}}\n\n'
            '    def logp(self, **params_values):\n'
            '        import jax.numpy as jnp\n'
            '        values = {{_NAME_MAP[k]: jnp.asarray(v) for k, v in params_values.items()\n'
            '                  if k in _NAME_MAP}}\n'
            '        lp, aux = self._like._compiled_logpost(values)\n'
            '        # cobaya applies priors itself: hand back the bare loglikelihood\n'
            '        return float(aux["loglikelihood"])\n'
        ).format(names=names, params=self.params_info())
        return body
