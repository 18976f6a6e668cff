"""CosmoSIS binding generator (reference bindings/cosmosis/factory.py)."""

from .base import BaseLikelihoodGenerator


class CosmoSISLikelihoodGenerator(BaseLikelihoodGenerator):
    """Generates a CosmoSIS module (setup/execute) reading the sampled
    parameters from the datablock and writing the log-likelihood."""

    def generate(self):
        params = self.varied_params()
        names = [p.name for p in params]
        body = self.header()
        body += (
            '\nfrom cosmosis.datablock import option_section, names as section_names\n\n'
            '_PARAM_NAMES = {names!r}\n\n\n'
            'def setup(options):\n'
            '    return _get_like()\n\n\n'
            'def execute(block, like):\n'
            '    import jax.numpy as jnp\n'
            '    values = {{}}\n'
            '    for name in _PARAM_NAMES:\n'
            '        key = name.replace(".", "_")\n'
            '        values[name] = jnp.asarray(block["desilike_tpu_params", key])\n'
            '    lp, aux = like._compiled_logpost(values)\n'
            '    block[section_names.likelihoods, "desilike_tpu_like"] = float(aux["loglikelihood"])\n'
            '    return 0\n\n\n'
            'def cleanup(like):\n'
            '    return 0\n'
        ).format(names=names)
        return body
