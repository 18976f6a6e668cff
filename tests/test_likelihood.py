import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.core import Calculator
from desilike_tpu.theories import DampedBAOWigglesTracerPowerSpectrumMultipoles
from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable, BoxFootprint
from desilike_tpu.likelihoods import ObservablesGaussianLikelihood, BaseGaussianLikelihood, SumLikelihood


def make_bao_likelihood(solve=False, ells=(0, 2)):
    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=ells)
    if solve:
        theory.init.params = {'al*': dict(derived='.marg', prior=dict(dist='norm', loc=0., scale=1e3))}
    obs = TracerPowerSpectrumMultipolesObservable(
        data={}, klim={ell: (0.02, 0.3, 0.01) for ell in ells}, theory=theory)
    footprint = BoxFootprint(volume=1e10, nbar=1e-3)
    return ObservablesGaussianLikelihood(observables=[obs], footprints=[footprint])


def test_bao_likelihood_truth_is_max():
    like = make_bao_likelihood()
    fn = like.logpost_fn()
    pipe = like.pipeline
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    lp0, aux = fn(vals)
    assert np.isfinite(float(lp0))
    assert float(aux['loglikelihood']) == pytest.approx(0., abs=1e-3)  # data==theory at truth
    for name, shift in [('qpar', 1.03), ('qper', 0.97), ('b1', 1.8)]:
        lp, _ = fn({**vals, name: jnp.asarray(shift)})
        assert float(lp) < float(lp0)


def test_bao_likelihood_gradient_zero_at_truth():
    like = make_bao_likelihood()
    fn = like.logpost_fn()
    pipe = like.pipeline
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    g = jax.grad(lambda v: fn(v)[0])(vals)
    for name in ('qpar', 'qper', 'b1'):
        assert abs(float(g[name])) < 0.5  # loglike grad is 0; prior grads small


def test_marginalization_matches_exact():
    """Analytic marginalization vs closed-form for a linear model."""
    rng = np.random.default_rng(42)
    x = np.linspace(0, 1, 20)
    cov = np.diag(np.full(20, 0.01))
    data = 1.5 * x + 0.3 * x ** 2 - 0.2 * x ** 3

    class Toy(BaseGaussianLikelihood):
        _params = dict(BaseGaussianLikelihood._params)
        _params.update({
            'a': dict(value=1.5, prior=dict(limits=[0, 3])),
            's1': dict(value=0., derived='.marg', prior=dict(dist='norm', loc=0., scale=2.)),
            's2': dict(value=0., derived='.best', prior=dict(dist='norm', loc=0., scale=3.)),
        })

        def initialize(self, **kwargs):
            super().initialize(data=data, covariance=cov)

        def flattheory(self):
            return self._a * jnp.asarray(x) + self._s1 * jnp.asarray(x) ** 2 + self._s2 * jnp.asarray(x) ** 3

        def calculate(self, a=1.5, s1=0., s2=0., **kw):
            self._a, self._s1, self._s2 = a, s1, s2
            super().calculate()

    like = Toy()
    fn = like.logpost_fn()
    aval = 1.4
    lp, aux = fn({'a': jnp.asarray(aval)})

    P = np.linalg.inv(cov)
    J = np.stack([x ** 2, x ** 3])
    d0 = aval * x - data
    prior_prec = np.diag([2. ** -2, 3. ** -2])
    g = -J @ P @ d0
    H = -(J @ P @ J.T) - prior_prec
    dx = -np.linalg.solve(H, g)
    ll = -0.5 * d0 @ P @ d0 + 0.5 * dx @ (-(J @ P @ J.T)) @ dx + g @ dx
    ll -= 0.5 * np.log(-H[0, 0])
    logprior = sum(-0.5 * (dx[i] / s) ** 2 - 0.5 * np.log(2 * np.pi * s ** 2)
                   for i, s in enumerate([2., 3.])) - np.log(3.)
    expected = ll + logprior
    assert float(lp) == pytest.approx(expected, abs=1e-4)
    np.testing.assert_allclose(np.asarray([aux['solved']['s1'], aux['solved']['s2']]), dx, atol=1e-4)


def test_bao_solved_broadband():
    """Marginalized broadband: posterior still peaks at truth, solved values ~0."""
    like = make_bao_likelihood(solve=True, ells=(0,))
    pipe = like.pipeline
    assert len(pipe.solved_params) == 5  # al0_-3..al0_1
    fn = like.logpost_fn()
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    assert 'al0_0' not in [p.name for p in pipe.varied_params]
    lp0, aux = fn(vals)
    assert np.isfinite(float(lp0))
    solved = np.array([float(v) for v in aux['solved'].values()])
    # data generated with al=0: best-fit coefficients must vanish relative to
    # their own posterior uncertainty (float32 eager-vs-jit noise sets the floor)
    sigma = np.sqrt(np.diag(np.linalg.inv(-np.asarray(aux['solved_hessian']))))
    assert np.all(np.abs(solved) < 0.1 * sigma)
    lp, _ = fn({**vals, 'qpar': jnp.asarray(1.05)})
    assert float(lp) < float(lp0)


def test_sum_likelihood():
    like1 = make_bao_likelihood(ells=(0,))
    like2 = make_bao_likelihood(ells=(0,))
    # rename to avoid param collision is not needed: same params shared
    total = SumLikelihood(likelihoods=[like1, like2])
    fn = total.logpost_fn()
    pipe = total.pipeline
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    lp, aux = fn(vals)
    assert np.isfinite(float(lp))


def test_vmap_likelihood():
    like = make_bao_likelihood(ells=(0,))
    fn = like.logpost_fn()
    pipe = like.pipeline
    vals = {p.name: jnp.broadcast_to(jnp.asarray(p.value), (16,)) for p in pipe.varied_params}
    vals['qpar'] = jnp.linspace(0.95, 1.05, 16)
    lps, _ = jax.vmap(fn)(vals)
    assert lps.shape == (16,)
    assert bool(jnp.all(jnp.isfinite(lps)))
    assert int(jnp.argmax(lps)) in (7, 8)


def test_prec_folding_matches_marg():
    """'.prec' (precision-folded once at init) must equal '.marg'
    (per-evaluation marginalization) for linear parameters."""
    like_marg = make_bao_likelihood(ells=(0,))
    like_marg.pipeline.params.update({'al0_0': dict(derived='.marg', prior=dict(dist='norm', loc=0., scale=100.))})
    # rebuild with explicit statuses
    def build(status):
        theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=(0,))
        theory.init.params = {'al0_0': dict(derived=status, prior=dict(dist='norm', loc=0., scale=100.))}
        obs = TracerPowerSpectrumMultipolesObservable(
            data={}, klim={0: (0.02, 0.3, 0.01)}, theory=theory)
        return ObservablesGaussianLikelihood(
            observables=[obs], footprints=[BoxFootprint(volume=1e10, nbar=1e-3)])

    lm = build('.marg')
    lp = build('.prec')
    fm = lm.logpost_fn()
    fp = lp.logpost_fn()
    for qpar in (1.0, 1.02):
        vm = {p.name: jnp.asarray(p.value) for p in lm.pipeline.varied_params}
        vp = {p.name: jnp.asarray(p.value) for p in lp.pipeline.varied_params}
        lpm, auxm = fm({**vm, 'qpar': jnp.asarray(qpar)})
        lpp, auxp = fp({**vp, 'qpar': jnp.asarray(qpar)})
        # loglikelihood agrees up to a constant normalization offset:
        # compare DIFFERENCES between parameter points
    d_m = float(fm({**vm, 'qpar': jnp.asarray(1.02)})[1]['loglikelihood']) - \
        float(fm({**vm, 'qpar': jnp.asarray(1.0)})[1]['loglikelihood'])
    d_p = float(fp({**vp, 'qpar': jnp.asarray(1.02)})[1]['loglikelihood']) - \
        float(fp({**vp, 'qpar': jnp.asarray(1.0)})[1]['loglikelihood'])
    assert d_m == pytest.approx(d_p, rel=1e-3, abs=1e-3)


def test_percival_factor_applied():
    rng = np.random.default_rng(5)
    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=(0,))
    obs = TracerPowerSpectrumMultipolesObservable(
        data={}, klim={0: (0.05, 0.15, 0.01)}, theory=theory)
    obs.runtime_info.initialize()
    nd = len(obs.flatdata)
    nmocks = 200
    mocks = obs.flatdata + rng.normal(0, 0.05 * np.abs(obs.flatdata), (nmocks, nd))
    obs2 = TracerPowerSpectrumMultipolesObservable(
        data=obs.flatdata, klim={0: (0.05, 0.15, 0.01)},
        theory=DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=(0,)),
        covariance=list(mocks))
    like = ObservablesGaussianLikelihood(observables=[obs2])
    like.runtime_info.initialize()
    assert like.hartlap < 1.
    fn = like.logpost_fn()
    # precision rescaled by exactly the Percival 2014 m factor
    nm, nd = 200, len(obs.flatdata)
    nv = len(like.pipeline.varied_params) + len(like.pipeline.solved_params)
    A = 2. / ((nm - nd - 1.) * (nm - nd - 4.))
    B = (nm - nd - 2.) / ((nm - nd - 1.) * (nm - nd - 4.))
    m = (1. + B * (nd - nv)) / (1. + A + B * (nv + 1.))
    np.testing.assert_allclose(like.precision, like._precision_base / m, rtol=1e-12)
    # rebuilding must be idempotent (factor recomputed from base, not stacked)
    prec1 = like.precision.copy()
    like.logpost_fn()
    np.testing.assert_allclose(like.precision, prec1, rtol=0, atol=0)
