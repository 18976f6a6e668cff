import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.core import Calculator


class Linear(Calculator):
    _params = {'a': dict(value=1., prior=dict(dist='norm', loc=1., scale=2.)),
               'b': dict(value=0., prior=dict(limits=[-5, 5]))}

    def initialize(self, x=None):
        self.x = np.linspace(0, 1, 11) if x is None else np.asarray(x)

    def calculate(self, a=1., b=0.):
        self.model = a * self.x + b


class Chi2(Calculator):
    _params = {'loglike': dict(derived=True)}

    def initialize(self):
        self.theory = Linear()

    def calculate(self):
        data = 2.0 * self.theory.x + 0.5
        self.loglike = -0.5 * jnp.sum((self.theory.model - data) ** 2)

    def get(self):
        return self.loglike


def test_pipeline_build():
    like = Chi2()
    pipe = like.pipeline
    assert pipe.params.names() == ['a', 'b', 'loglike']
    assert pipe.varied_params.names() == ['a', 'b']
    assert len(pipe.calculators) == 2
    # dependencies first
    assert isinstance(pipe.calculators[0], Linear)


def test_pipeline_eval_jit_grad_vmap():
    like = Chi2()
    pipe = like.pipeline
    assert float(pipe.evaluate({'a': 2.0, 'b': 0.5})) == pytest.approx(0.)
    fn = pipe.get_fn()
    v = {'a': jnp.asarray(1.0), 'b': jnp.asarray(0.0)}
    assert float(fn(v)) < 0
    g = jax.grad(fn)(v)
    assert float(g['a']) > 0 and float(g['b']) > 0
    vm = jax.vmap(fn)({'a': jnp.linspace(1, 2, 5), 'b': jnp.full(5, 0.5)})
    assert vm.shape == (5,)
    assert float(vm[-1]) == pytest.approx(0.)


def test_reinit_on_config_change():
    like = Chi2()
    pipe = like.pipeline
    pipe.evaluate({})
    lin = [c for c in pipe.calculators if isinstance(c, Linear)][0]
    lin.init.update(x=np.linspace(0, 2, 21))
    pipe2 = like.pipeline
    assert pipe2 is not pipe
    assert len([c for c in pipe2.calculators if isinstance(c, Linear)][0].x) == 21


def test_derived_expression():
    class WithDerived(Chi2):
        _params = {'loglike': dict(derived=True)}

        def initialize(self):
            super().initialize()
            self.theory.init.params = {
                'a': dict(value=1., prior=dict(limits=[0, 3])),
                'b': dict(derived='{a}/2')}

    like = WithDerived()
    pipe = like.pipeline
    assert pipe.varied_params.names() == ['a']
    lin = [c for c in pipe.calculators if isinstance(c, Linear)][0]
    pipe.evaluate({'a': 2.0})
    np.testing.assert_allclose(np.asarray(lin.model), 2.0 * lin.x + 1.0, rtol=1e-6)


def test_basename_shortcut_and_namespace():
    lin = Linear(namespace='lrg')
    pipe = lin.pipeline
    assert pipe.params.names() == ['lrg.a', 'lrg.b']
    pipe.evaluate({'a': 2.0})  # basename shortcut
    np.testing.assert_allclose(np.asarray(lin.model), 2.0 * lin.x, rtol=1e-6)
