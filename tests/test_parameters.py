import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.parameters import Parameter, ParameterCollection, Prior, Samples, Deriv, DerivArray


def test_prior_uniform():
    p = Prior(limits=(-1., 3.))
    assert abs(float(p.logpdf(0.)) - (-np.log(4.))) < 1e-6
    assert float(p.logpdf(5.)) == -np.inf
    key = jax.random.key(0)
    x = p.sample(key, (1000,))
    assert float(x.min()) >= -1. and float(x.max()) <= 3.
    np.testing.assert_allclose(p.ppf(np.array([0., 0.5, 1.])), [-1., 1., 3.])


def test_prior_norm():
    p = Prior(dist='norm', loc=1., scale=2.)
    from scipy.stats import norm
    assert abs(float(p.logpdf(0.5)) - norm.logpdf(0.5, 1., 2.)) < 1e-5
    assert abs(p.std - 2.) < 1e-9
    # truncated
    pt = Prior(dist='norm', loc=0., scale=1., limits=(-1., 1.))
    from scipy.stats import truncnorm
    assert abs(float(pt.logpdf(0.)) - truncnorm.logpdf(0., -1., 1.)) < 1e-5


def test_prior_grad():
    p = Prior(dist='norm', loc=0., scale=2.)
    g = jax.grad(lambda x: p.logpdf(x))(1.0)
    assert abs(float(g) - (-0.25)) < 1e-6


def test_parameter_basics():
    p = Parameter(basename='b1', value=2., prior=dict(limits=[0., 4.]), latex='b_1')
    assert p.name == 'b1' and p.varied and not p.solved
    q = Parameter(name='lrg.b1', value=1.)
    assert q.namespace == 'lrg' and q.basename == 'b1'
    s = Parameter(basename='al0_0', derived='.marg', prior=dict(dist='norm', loc=0., scale=10.))
    assert s.solved
    d = Parameter(basename='fs8', derived='{f}*{sigma8}')
    assert d.depends == ['f', 'sigma8']


def test_collection_select():
    params = ParameterCollection({
        'qpar': dict(value=1., prior=dict(limits=[0.8, 1.2])),
        'qper': dict(value=1., prior=dict(limits=[0.8, 1.2])),
        'al0_0': dict(value=0., derived='.marg', prior=dict(dist='norm', loc=0, scale=1)),
        'b1': dict(value=2., fixed=True)})
    assert params.names(basename='q*') == ['qpar', 'qper']
    assert params.select(solved=True).names() == ['al0_0']
    assert params.select(fixed=True).names() == ['b1']
    params.update({'q*': dict(fixed=True)})
    assert params['qpar'].fixed


def test_samples_roundtrip(tmp_path):
    s = Samples({'a': np.arange(10.), 'b': np.ones(10)})
    s['c'] = DerivArray(np.ones((3, 10)), derivs=[(), ('a',), ('a', 'a')])
    fn = tmp_path / 'samples.npz'
    s.save(fn)
    s2 = Samples.load(str(fn))
    np.testing.assert_allclose(s2['a'], np.arange(10.))
    np.testing.assert_allclose(np.asarray(s2['c'][('a',)]), np.ones(10))
    assert s2.shape == (10,)


def test_deriv():
    d1 = Deriv(('a', 'b'))
    d2 = Deriv(('b', 'a'))
    assert d1 == d2 and hash(d1) == hash(d2)
    assert Deriv().total == 0 and d1.total == 2


def test_parameter_covariance_container():
    """ParameterCovariance: views, marginalize/fix algebra, getdist covmat
    round-trip, fisher round-trip (reference parameter.py:2527)."""
    from desilike_tpu.parameters import ParameterCovariance
    rng = np.random.default_rng(3)
    A = rng.normal(size=(3, 3))
    cov = A @ A.T + 3. * np.eye(3)
    names = ['a', 'b', 'c']
    pc = ParameterCovariance(cov, names, center=[1., 2., 3.])
    np.testing.assert_allclose(pc.view(['a', 'c']), cov[np.ix_([0, 2], [0, 2])])
    np.testing.assert_allclose(pc.std('b'), np.sqrt(cov[1, 1]))
    # marginalize = submatrix; fix = inverse of precision submatrix
    marg = pc.marginalize(['b'])
    np.testing.assert_allclose(marg.view(), cov[np.ix_([0, 2], [0, 2])])
    fixed = pc.fix(['b'])
    prec = np.linalg.inv(cov)
    np.testing.assert_allclose(fixed.view(), np.linalg.inv(prec[np.ix_([0, 2], [0, 2])]))
    # conditioning shrinks variances; marginal keeps them
    assert np.all(np.diag(fixed.view()) <= np.diag(marg.view()) + 1e-12)
    assert pc.fom() == pytest.approx(np.linalg.det(cov) ** -0.5)
    # getdist covmat round-trip
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        fn = os.path.join(d, 'test.covmat')
        pc.write_getdist(fn)
        back = ParameterCovariance.from_getdist(fn)
        assert back.names() == names
        np.testing.assert_allclose(back.view(), cov, rtol=1e-10)
        fn2 = os.path.join(d, 'pc.npz')
        pc.save(fn2)
        loaded = ParameterCovariance.load(fn2)
        np.testing.assert_allclose(loaded.view(), cov)
        np.testing.assert_allclose(loaded.center, [1., 2., 3.])
    # fisher round-trip
    fisher = pc.to_fisher()
    np.testing.assert_allclose(fisher.covariance(), cov, rtol=1e-10)
    back = ParameterCovariance.from_fisher(fisher, params=['c', 'a'])
    np.testing.assert_allclose(back.view(), cov[np.ix_([2, 0], [2, 0])], rtol=1e-10)


def test_parameter_precision_container():
    """ParameterPrecision (reference parameter.py:2820): dual algebra to the
    covariance (restriction = conditioning), precision addition for
    independent constraints, covariance round-trip, save/load."""
    from desilike_tpu.parameters import ParameterCovariance, ParameterPrecision
    rng = np.random.default_rng(7)
    A = rng.normal(size=(3, 3))
    cov = A @ A.T + 3. * np.eye(3)
    prec = np.linalg.inv(cov)
    names = ['a', 'b', 'c']
    pp = ParameterPrecision(prec, names, center=[1., 2., 3.])
    # restriction of a precision == conditioning == covariance .fix()
    pc = ParameterCovariance(cov, names, center=[1., 2., 3.])
    np.testing.assert_allclose(np.linalg.inv(pp.view(['a', 'c'])),
                               pc.fix(['b']).view(), rtol=1e-10)
    # round-trips (marginalization happens on the covariance side)
    np.testing.assert_allclose(pp.to_covariance().view(), cov, rtol=1e-10)
    np.testing.assert_allclose(pp.to_covariance(['a', 'c']).view(),
                               cov[np.ix_([0, 2], [0, 2])], rtol=1e-10)
    np.testing.assert_allclose(pc.to_precision().view(), prec, rtol=1e-10)
    assert pp.fom() == pytest.approx(np.linalg.det(prec) ** 0.5)
    # two independent Gaussians on overlapping params: precisions add,
    # centers combine precision-weighted
    p1 = ParameterPrecision(np.array([[4.]]), ['a'], center=[0.])
    p2 = ParameterPrecision(np.array([[4., 0.], [0., 1.]]), ['a', 'b'],
                            center=[1., 5.])
    tot = p1 + p2
    assert tot.names() == ['a', 'b']
    np.testing.assert_allclose(tot.view(), [[8., 0.], [0., 1.]])
    np.testing.assert_allclose(tot.center, [0.5, 5.])
    # fisher hand-off keeps the precision as -hessian
    np.testing.assert_allclose(pp.to_fisher().precision, prec, rtol=1e-10)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        fn = os.path.join(d, 'pp.npz')
        pp.save(fn)
        loaded = ParameterPrecision.load(fn)
        np.testing.assert_allclose(loaded.view(), prec)
        np.testing.assert_allclose(loaded.center, [1., 2., 3.])


def test_parameter_covariance_from_chain():
    from desilike_tpu.parameters import ParameterCovariance
    from desilike_tpu.samples.chain import Chain
    rng = np.random.default_rng(5)
    chain = Chain()
    chain['x'] = rng.normal(1., 0.5, size=4000)
    chain['y'] = chain['x'] * 0.3 + rng.normal(0., 0.2, size=4000)
    chain['logposterior'] = np.zeros(4000)
    pc = ParameterCovariance.from_chain(chain, params=['x', 'y'])
    assert pc.std('x') == pytest.approx(0.5, rel=0.1)
    assert pc.corrcoef()[0, 1] == pytest.approx(0.6, abs=0.1)
    assert pc.center[0] == pytest.approx(1., abs=0.05)
