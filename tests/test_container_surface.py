"""Reference container-method surface (round-5 method audit): Chain
statistics, LikelihoodFisher algebra, Samples pytree/reshape, Profiles
container protocol, Parameter.eval, ObservableCovariance.slice — the
user-facing object methods a migrating reference script calls
(ref samples/chain.py, fisher.py:63, parameter.py, observables/types.py)."""

import numpy as np
import pytest


def test_chain_statistics_surface():
    from desilike_tpu.samples import Chain
    rng = np.random.default_rng(0)
    x = rng.normal(1., 0.5, size=4000)
    y = 2. * x + rng.normal(0., 0.1, size=4000)
    lp = -(x - 1.) ** 2
    chain = Chain({'x': x, 'y': y, 'logposterior': lp})

    assert chain.mean('x') == pytest.approx(1., abs=0.05)
    np.testing.assert_allclose(chain.mean(['x', 'y']), [chain.mean('x'), chain.mean('y')])
    assert chain.median('x') == pytest.approx(1., abs=0.05)
    assert chain.var('x') == pytest.approx(0.25, rel=0.15)
    # ddof honored and defaulting to 1, like the reference (ref chain.py:726)
    assert chain.var('x') == pytest.approx(np.var(x, ddof=1), rel=1e-10)
    assert chain.var('x', ddof=0) == pytest.approx(np.var(x, ddof=0), rel=1e-10)
    assert chain.var('x', ddof=0) < chain.var('x', ddof=1)
    assert chain.std('x', ddof=0) == pytest.approx(np.std(x, ddof=0), rel=1e-10)
    cc = chain.corrcoef(['x', 'y'])
    assert cc[0, 1] > 0.95
    P = chain.precision(['x', 'y'])
    np.testing.assert_allclose(P @ chain.covariance(['x', 'y']), np.eye(2), atol=1e-8)

    best = chain.choice(index='argmax')
    assert best['x'] == pytest.approx(x[np.argmax(lp)])
    assert chain.argmax('x') == pytest.approx(x[np.argmax(lp)])
    mean_arr = chain.choice(index='mean', params=['x'], return_type='nparray')
    assert mean_arr.shape == (1,)

    # reserved-column accessors create defaults
    assert np.allclose(chain.aweight, 1.) and np.allclose(chain.fweight, 1)
    chain.set_derived('z', x + y)
    assert 'z' in chain.data and chain.params['z'].derived is True
    assert 'parameter' in chain.to_stats(['x'])


def test_chain_read_getdist(tmp_path):
    from desilike_tpu.samples import Chain
    rng = np.random.default_rng(1)
    chain = Chain({'x': rng.normal(size=50), 'logposterior': -rng.random(50)})
    chain.write_getdist(str(tmp_path / 'c'))
    loaded = Chain.read_getdist(str(tmp_path / 'c'))
    np.testing.assert_allclose(np.asarray(loaded['x']), np.asarray(chain['x']), rtol=1e-5)


def test_likelihood_fisher_surface():
    from desilike_tpu import LikelihoodFisher
    from desilike_tpu.parameters import ParameterCollection
    params = ParameterCollection([{'basename': 'a'}, {'basename': 'b'}])
    H = -np.array([[4., 1.], [1., 2.]])
    g = np.array([0.4, 0.2])
    F = LikelihoodFisher(np.array([1., -1.]), params, H, gradient=g)

    mean = F.mean()
    np.testing.assert_allclose(H @ (F.center - mean), g, atol=1e-12)
    assert F.mean('a') == pytest.approx(mean[0])
    assert F.choice()['b'] == pytest.approx(mean[1])
    # chi2 at the mean is the stationary value; shifting the mean raises it
    assert F.shift(mean).chi2min() == pytest.approx(F.chi2min())
    shifted = F.shift([0., 0.])
    np.testing.assert_allclose(shifted.mean(), [0., 0.], atol=1e-12)

    np.testing.assert_allclose(F.var(), np.diag(F.covariance()))
    cc = F.corrcoef()
    assert cc[0, 0] == pytest.approx(1.)
    sub = F.select(params=['a'])
    assert sub.names() == ['a'] and sub.hessian.shape == (1, 1)
    # view with an unknown param pads zero precision
    wide = F.view(['a', 'c'])
    assert wide.hessian[1, 1] == 0.
    clone = F.clone(offset=-3.)
    assert clone.offset == -3. and np.allclose(clone.hessian, F.hessian)
    assert F.deepcopy().names() == F.names()


def test_fisher_covariance_getdist_roundtrip(tmp_path):
    from desilike_tpu import LikelihoodFisher
    from desilike_tpu.parameters import ParameterCollection, ParameterCovariance
    cov = ParameterCovariance(np.array([[0.25, 0.05], [0.05, 0.5]]), ['a', 'b'])
    fn = cov.write_getdist(str(tmp_path / 'test.covmat'))
    F = LikelihoodFisher.read_getdist(fn)
    np.testing.assert_allclose(F.covariance(), np.asarray([[0.25, 0.05], [0.05, 0.5]]), rtol=1e-8)
    cov2 = ParameterCovariance.read_getdist(fn)
    np.testing.assert_allclose(cov2.var(), [0.25, 0.5])
    assert 'sigma' in cov2.to_stats()


def test_samples_surface():
    import jax
    from desilike_tpu.parameters import Samples
    s = Samples({'x': np.arange(12.), 'y': np.arange(12.) ** 2})
    assert s.ndim == 1
    r = s.reshape(3, 4)
    assert r.shape == (3, 4) and np.asarray(r['x']).shape == (3, 4)

    other = Samples({'z': np.ones(12)})
    s.update(other)
    assert 'z' in s.data

    arr = s.to_array(params=['x', 'y'], struct=False)
    assert arr.shape == (2, 12)
    struct = s.to_array(params=['x'])
    assert struct.dtype.names == ('x',)

    # match: permuted copy maps back to the right rows
    perm = np.random.default_rng(2).permutation(12)
    shuffled = Samples({'x': np.arange(12.)[perm], 'y': (np.arange(12.) ** 2)[perm]})
    in_other, in_self = s.match(shuffled, params=['x', 'y'])
    np.testing.assert_array_equal(np.asarray(shuffled['x'])[in_other], np.asarray(s['x'])[in_self])

    leaves, aux = s.tree_flatten()
    rebuilt = Samples.tree_unflatten(aux, leaves)
    np.testing.assert_array_equal(np.asarray(rebuilt['x']), np.asarray(s['x']))


def test_profiles_container_protocol():
    from desilike_tpu.samples import Profiles
    pr = Profiles(attrs={'tag': 1})
    pr.set('covariance', np.eye(2))
    assert np.allclose(pr.get('covariance'), np.eye(2))
    names = [name for name, _ in pr.items()]
    assert 'covariance' in names and 'bestfit' in names
    clone = pr.clone(covariance=2. * np.eye(2))
    assert clone.covariance[0, 0] == 2. and pr.covariance[0, 0] == 1.
    assert clone.attrs == {'tag': 1}


def test_parameter_eval_and_proxies():
    from desilike_tpu.parameters import Parameter, ParameterCollection
    a = Parameter(basename='a', value=1., prior=dict(limits=[0., 2.]))
    assert a.limits == (0., 2.) and a.ndim == 0 and a.size == 1
    c = Parameter(basename='c', derived='{a}+2*{b}')
    assert c.eval(a=1., b=3.) == 7.
    coll = ParameterCollection([a, {'basename': 'b', 'value': 3.}, c])
    out = coll.eval(a=1., b=3.)
    assert out['c'] == 7. and out['a'] == 1.
    assert coll.params(basename='a').names() == ['a']
    assert a.deepcopy().name == 'a'


def test_observable_covariance_slice():
    from desilike_tpu.observables import ObservableArray, ObservableCovariance
    x = np.linspace(0.05, 0.2, 8)
    obs = ObservableArray(x=[x, x], value=[np.ones(8), 2 * np.ones(8)], projs=[0, 2])
    cov = ObservableCovariance(np.diag(np.arange(1., 17.)), observables=[obs])
    sliced = cov.slice(slice(0, 8, 2))
    assert sliced.shape == (8, 8)
    # group-averaging a diagonal: var -> mean over the pair / 2 (equal weights)
    np.testing.assert_allclose(np.diag(sliced)[0], (1. + 2.) / 4.)
    new_x = sliced.observables[0].x[0]
    np.testing.assert_allclose(new_x, x[:8].reshape(-1, 2).mean(axis=1))
    # plain selection with step 1
    sel = cov.slice(slice(0, 4), projs=[0], select_projs=True)
    assert sel.shape == (4, 4)


def test_calculator_params_lazy():
    from desilike_tpu.core import Calculator

    class Node(Calculator):
        _params = {'a': dict(value=1., prior=dict(limits=[0., 2.]))}

        def calculate(self, a=1.):
            self.out = a

    node = Node()
    assert node.params['a'].value == 1.  # lazy init on access
    assert node.deepcopy().__class__ is Node
