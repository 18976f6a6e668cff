"""MontePython binding generator (reference bindings/montepython/factory.py)."""

from .base import BaseLikelihoodGenerator


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
