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


def test_percival_outside_validity_degrades_to_hartlap(caplog):
    """nmocks barely above ndata: Percival 2014 is outside its validity
    regime — warn and apply the Hartlap-only factor (as the reference does,
    likelihoods/base.py:633-656), instead of hard-failing at logpost_fn."""
    import logging
    rng = np.random.default_rng(6)
    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=(0,))
    obs = TracerPowerSpectrumMultipolesObservable(
        data={}, klim={0: (0.05, 0.15, 0.01)}, theory=theory)
    obs.runtime_info.initialize()
    nd = len(obs.flatdata)
    nmocks = nd + 3  # Hartlap defined (> nd + 2), Percival not (< nd + 5)
    mocks = obs.flatdata + rng.normal(0, 0.05 * np.abs(obs.flatdata), (nmocks, nd))
    obs2 = TracerPowerSpectrumMultipolesObservable(
        data=obs.flatdata, klim={0: (0.05, 0.15, 0.01)},
        theory=DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=(0,)),
        covariance=list(mocks))
    like = ObservablesGaussianLikelihood(observables=[obs2])
    like.runtime_info.initialize()
    assert 0. < like.hartlap < 1.
    with caplog.at_level(logging.WARNING):
        fn = like.logpost_fn()
    assert any('Hartlap factor only' in rec.message for rec in caplog.records)
    # Hartlap-only: precision is the (Hartlap-scaled) base, no Percival m
    np.testing.assert_allclose(like.precision, like._precision_base, rtol=0, atol=0)
    vals = {p.name: jnp.asarray(p.value) for p in like.pipeline.varied_params}
    lp, _ = fn(vals)
    assert np.isfinite(float(lp))


def test_sum_with_nongaussian_and_dynamic_solved():
    """Regression: a non-Gaussian likelihood summed with a Gaussian that has
    a dynamically-solved (linearize-path) param must not leak tracers (its
    loglikelihood is set inside jax.linearize and must be returned by it)."""
    from desilike_tpu.likelihoods import BaseLikelihood

    class PlainLikelihood(BaseLikelihood):
        _params = dict(BaseLikelihood._params)
        _params.update({'c': dict(value=0.3, prior=dict(dist='norm', loc=0., scale=1.),
                                  ref=dict(dist='norm', loc=0., scale=0.1))})

        def calculate(self, c=0., **kw):
            self.loglikelihood = -0.5 * (c / 0.5) ** 2

    from test_samplers import GaussianModel

    class SolvedGaussian(GaussianModel):
        _params = dict(GaussianModel._params)
        _params['b'] = dict(_params['b'], derived='.marg',
                            prior=dict(dist='norm', loc=-0.5, scale=10.))

    total = SolvedGaussian() + PlainLikelihood()
    fn = total.logpost_fn()
    lp0, aux = fn({'a': jnp.asarray(1.0), 'c': jnp.asarray(0.3)})
    assert np.isfinite(float(lp0))
    assert 'b' in aux['solved']
    # the plain likelihood contributes: changing c moves the posterior by
    # exactly its own loglike difference
    lp1, _ = fn({'a': jnp.asarray(1.0), 'c': jnp.asarray(0.6)})
    expected = (-0.5 * (0.6 / 0.5) ** 2) - (-0.5 * (0.3 / 0.5) ** 2) \
        + float(np.log(np.exp(-0.5 * 0.6 ** 2) / np.exp(-0.5 * 0.3 ** 2)))  # prior on c
    assert float(lp1 - lp0) == pytest.approx(expected, abs=1e-4)
    # the GRADIENT must flow through the non-Gaussian loglike too
    g = jax.grad(lambda v: fn(v)[0])({'a': jnp.asarray(1.0), 'c': jnp.asarray(0.3)})
    assert float(g['c']) == pytest.approx(-0.3 / 0.25 - 0.3, abs=1e-4)


def test_analytic_basis_with_other_dynamic_solved():
    """Regression: analytic-basis (solved_power_basis) params coexisting
    with another dynamically-solved param — the bases are evaluated inside
    the linearize trace and must be returned from it."""
    from desilike_tpu.theories import EFTLikeKaiserTracerPowerSpectrumMultipoles, ShapeFitPowerSpectrumTemplate
    theory = EFTLikeKaiserTracerPowerSpectrumMultipoles(
        ells=(0, 2), template=ShapeFitPowerSpectrumTemplate(z=1.))
    theory.init.params = {
        'ct*': dict(derived='.marg'),                     # analytic basis rows
        'sigmapar': dict(derived='.best', fixed=False,    # nonlinear -> linearize
                         prior=dict(dist='norm', loc=4., scale=3.)),
    }
    obs = TracerPowerSpectrumMultipolesObservable(
        data={'b1': 2.0}, klim={0: (0.02, 0.2, 0.01), 2: (0.02, 0.2, 0.01)}, theory=theory)
    like = ObservablesGaussianLikelihood(observables=[obs],
                                         footprints=[BoxFootprint(volume=2e9, nbar=5e-4)])
    fn = like.logpost_fn()
    names = [p.name for p in like.pipeline.varied_params]
    vals = {n: jnp.asarray(like.pipeline.params[n].value) for n in names}
    lp, aux = fn(vals)
    assert np.isfinite(float(lp))
    assert 'sigmapar' in aux['solved'] and any(n.startswith('ct') for n in aux['solved'])
    # the gradient must flow through the analytic J rows' dependence on the
    # varied params (bases ~ pk11(df, ...)): check vs finite differences
    def lp_of_df(df):
        return fn({**vals, 'df': df})[0]
    g = float(jax.grad(lp_of_df)(jnp.asarray(1.0)))
    eps = 1e-3
    fd = (float(lp_of_df(jnp.asarray(1.0 + eps))) - float(lp_of_df(jnp.asarray(1.0 - eps)))) / (2 * eps)
    assert g == pytest.approx(fd, rel=2e-2), (g, fd)


def test_prec_rebuild_idempotent():
    """Regression: rebuilding logpost_fn (or calling logpost repeatedly) on a
    '.prec' likelihood must not re-inflate the covariance."""
    theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=(0,))
    theory.init.params = {'al0_0': dict(derived='.prec', prior=dict(dist='norm', loc=0., scale=100.))}
    obs = TracerPowerSpectrumMultipolesObservable(
        data={}, klim={0: (0.02, 0.3, 0.01)}, theory=theory)
    like = ObservablesGaussianLikelihood(
        observables=[obs], footprints=[BoxFootprint(volume=1e10, nbar=1e-3)])
    fn1 = like.logpost_fn()
    cov1 = np.array(like.covariance)
    fn2 = like.logpost_fn()
    np.testing.assert_allclose(np.array(like.covariance), cov1, rtol=0, atol=0)
    v = {p.name: jnp.asarray(p.value) for p in like.pipeline.varied_params}
    np.testing.assert_allclose(float(fn1(v)[0]), float(fn2(v)[0]), rtol=1e-6)


def test_cubic_transform_solved_uses_local_jacobian():
    """transform='cubic' makes flatdiff NONLINEAR in exactly-linear theory
    params (broadband al*): the solver must not use static unit-step design
    matrices or primal analytic basis rows — it must linearize through the
    transform (reference semantics: FastFisher jacfwd's flatdiff per eval).
    The solved best-fits are pinned against a manual local-Jacobian Newton
    solve; the unit-step secant J is shown to be measurably different."""

    def build(solve):
        theory = DampedBAOWigglesTracerPowerSpectrumMultipoles(ells=(0,))
        if solve:
            theory.init.params = {'al*': dict(derived='.marg', prior=dict(dist='norm', loc=0., scale=1e3))}
        else:
            theory.init.params = {'al*': dict(prior=dict(dist='norm', loc=0., scale=1e3))}
        obs = TracerPowerSpectrumMultipolesObservable(
            data={'b1': 2.2},   # mock at b1=2.2, evaluated at default 1.5 -> T/D != 1
            klim={0: (0.02, 0.3, 0.01)}, theory=theory, transform='cubic')
        return ObservablesGaussianLikelihood(
            observables=[obs], footprints=[BoxFootprint(volume=1e10, nbar=1e-3)])

    like = build(solve=True)
    pipe = like.pipeline
    solved = pipe.solved_params
    assert len(solved) == 5
    # path selection: the transform disqualifies both fast paths
    assert like._static_linear_indices(pipe, solved, [like]) == []
    assert like.solved_flat_basis_fn(solved[0]) is False
    fn = like.logpost_fn()
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    lp, aux = fn(vals)
    assert np.isfinite(float(lp))
    got = np.array([float(aux['solved'][p.name]) for p in solved])

    # manual truth: local J of the WHITENED transformed residual at al=0
    ref = build(solve=False)
    pipe2 = ref.pipeline
    names = [p.name for p in solved]

    def fdw(overrides):
        v = {p.name: p.value for p in pipe2.varied_params}
        v.update(overrides)
        pipe2.evaluate(v)
        return np.asarray(ref._whiten, dtype='f8') @ (
            np.asarray(ref.flattheory(), dtype='f8') - np.asarray(ref.flatdata, dtype='f8'))

    d0 = fdw({})
    eps = 1.
    J_local = np.stack([(fdw({n: eps}) - fdw({n: -eps})) / (2 * eps) for n in names])
    # a secant at the scale of the actual solve (dx ~ 1e3-1e4 here): the
    # transform's nonlinearity over that range is what a static design
    # matrix would average over
    step = 2000.
    J_secant = np.stack([(fdw({n: step}) - d0) / step for n in names])
    prior_prec = np.diag(np.full(len(names), 1e-6))

    def newton(J):
        g = -J @ d0
        H = -(J @ J.T) - prior_prec
        return -np.linalg.solve(H, g)

    dx_local = newton(J_local)
    dx_secant = newton(J_secant)
    err_got = np.max(np.abs(got - dx_local))
    # the solve-scale secant genuinely differs (the test has teeth)
    assert np.max(np.abs(dx_secant - dx_local)) > 10 * err_got
    np.testing.assert_allclose(got, dx_local, rtol=3e-2, atol=3e-2 * np.max(np.abs(dx_local)))
