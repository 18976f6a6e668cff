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
