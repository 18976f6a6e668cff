import numpy as np
import jax.numpy as jnp
import pytest

from desilike_tpu.core import Calculator
from desilike_tpu.likelihoods import BaseGaussianLikelihood
from desilike_tpu.samplers import EnsembleSampler, EnsembleSliceSampler, MCMCSampler


class GaussianModel(BaseGaussianLikelihood):
    """2-parameter linear-model fixture (reference tests/test_samplers.py:10-34)."""
    _mean = np.array([1.0, -0.5])
    _cov_data = 0.04

    _params = dict(BaseGaussianLikelihood._params)
    _params.update({
        'a': dict(value=1.0, prior=dict(limits=[-4, 4]), ref=dict(dist='norm', loc=1.0, scale=0.2)),
        'b': dict(value=-0.5, prior=dict(limits=[-4, 4]), ref=dict(dist='norm', loc=-0.5, scale=0.2)),
    })

    def initialize(self, **kwargs):
        self.x = np.linspace(-1, 1, 50)
        data = self._mean[0] * self.x + self._mean[1]
        super().initialize(data=data, covariance=np.eye(50) * self._cov_data)

    def flattheory(self):
        return self._a * jnp.asarray(self.x) + self._b

    def calculate(self, a=1., b=0., **kw):
        self._a, self._b = a, b
        super().calculate()


def analytic_cov():
    x = np.linspace(-1, 1, 50)
    J = np.stack([x, np.ones_like(x)])
    F = J @ J.T / GaussianModel._cov_data
    return np.linalg.inv(F)


@pytest.mark.parametrize('sampler_cls,kwargs', [
    (EnsembleSampler, dict(nwalkers=64)),
    (EnsembleSliceSampler, dict(nwalkers=64)),
    (MCMCSampler, dict(nchains=8)),
])
def test_sampler_recovers_gaussian(sampler_cls, kwargs):
    like = GaussianModel()
    sampler = sampler_cls(like, seed=7, **kwargs)
    nsteps = 300 if sampler_cls is EnsembleSliceSampler else 800
    chain = sampler.run(nsteps=nsteps).remove_burnin(0.5)
    cov = analytic_cov()
    for i, name in enumerate(('a', 'b')):
        assert chain.mean(name) == pytest.approx(GaussianModel._mean[i], abs=4 * np.sqrt(cov[i, i]) / 10)
        assert chain.std(name) == pytest.approx(np.sqrt(cov[i, i]), rel=0.25)
    gr = chain.gelman_rubin(('a', 'b'))
    assert np.all(gr < 1.2)


def test_chain_tools():
    like = GaussianModel()
    sampler = EnsembleSampler(like, seed=3, nwalkers=32)
    chain = sampler.run(nsteps=200)
    assert chain.shape == (200, 32)
    assert 'loglikelihood' in chain
    burned = chain.remove_burnin(100)
    assert burned.shape == (100, 32)
    lo, hi = burned.interval('a')
    assert lo < burned.mean('a') < hi
    ess = burned.effective_sample_size('a')
    assert ess > 50
    table = burned.to_stats_table()
    assert 'a' in table


def test_chain_reproducible():
    like = GaussianModel()
    c1 = EnsembleSampler(like, seed=11, nwalkers=32).run(nsteps=50)
    c2 = EnsembleSampler(like, seed=11, nwalkers=32).run(nsteps=50)
    np.testing.assert_array_equal(np.asarray(c1['a']), np.asarray(c2['a']))


def test_nuts_recovers_gaussian():
    from desilike_tpu.samplers import NUTSSampler
    like = GaussianModel()
    sampler = NUTSSampler(like, seed=5, nchains=4, max_depth=6)
    chain = sampler.run(nsteps=300, nwarmup=300)
    assert sampler.diagnostics['divergence_rate'] < 0.01
    cov = analytic_cov()
    for i, name in enumerate(('a', 'b')):
        assert chain.mean(name) == pytest.approx(GaussianModel._mean[i], abs=3 * np.sqrt(cov[i, i]) / 10)
        assert chain.std(name) == pytest.approx(np.sqrt(cov[i, i]), rel=0.25)
    # NUTS should decorrelate fast: high ESS per sample
    assert chain.effective_sample_size('a') > 300


def test_hmc_recovers_gaussian():
    from desilike_tpu.samplers import HMCSampler
    like = GaussianModel()
    sampler = HMCSampler(like, seed=9, nchains=4, nleapfrog=16)
    chain = sampler.run(nsteps=400, nwarmup=300)
    cov = analytic_cov()
    for i, name in enumerate(('a', 'b')):
        assert chain.mean(name) == pytest.approx(GaussianModel._mean[i], abs=4 * np.sqrt(cov[i, i]) / 10)
        assert chain.std(name) == pytest.approx(np.sqrt(cov[i, i]), rel=0.3)


def test_mclmc_runs():
    from desilike_tpu.samplers import MCLMCSampler
    like = GaussianModel()
    sampler = MCLMCSampler(like, seed=9, nchains=4)
    chain = sampler.run(nsteps=1500, nwarmup=500)
    cov = analytic_cov()
    # unadjusted method: looser tolerances
    for i, name in enumerate(('a', 'b')):
        assert chain.mean(name) == pytest.approx(GaussianModel._mean[i], abs=5 * np.sqrt(cov[i, i]) / 10)
        assert chain.std(name) == pytest.approx(np.sqrt(cov[i, i]), rel=0.5)


def test_batch_sample_with_convergence():
    like = GaussianModel()
    sampler = EnsembleSampler(like, seed=13, nwalkers=64)
    chain = sampler.sample(max_iterations=3000, check_every=300, min_iterations=600,
                           max_gr=1.05, min_ess=400)
    assert sampler.diagnostics['converged']
    assert chain.shape[0] >= 600
    cov = analytic_cov()
    burned = chain.remove_burnin(0.5)
    assert burned.mean('a') == pytest.approx(1.0, abs=3 * np.sqrt(cov[0, 0]) / 5)


def test_nuts_manychain_short_warmup_mixing():
    """Regression for the round-1 many-chain mixing bug: the iterative-NUTS
    checkpoint stored the PRE-leapfrog state, breaking the balanced-subtree
    U-turn criterion and prematurely truncating trajectories. With the fix,
    many chains with a short retained window mix to GR ~ 1."""
    import jax
    from jax import lax
    from desilike_tpu.samplers.nuts import build_nuts_kernel

    ndim, nchains, nsteps = 5, 512, 70
    rng = np.random.default_rng(0)
    A = rng.normal(size=(ndim, ndim))
    cov = A @ A.T + ndim * np.eye(ndim)
    prec = jnp.asarray(np.linalg.inv(cov))
    lg = jax.value_and_grad(lambda z: -0.5 * z @ prec @ z)
    kernel = build_nuts_kernel(lg, ndim, max_depth=8)
    inv_mass = jnp.ones(ndim)

    def chain(u, key):
        lp, grad = lg(u)

        def body(carry, k):
            u, lp, grad = carry
            u, lp, grad, _ = kernel(k, u, lp, grad, 0.4, inv_mass)
            return (u, lp, grad), u
        _, us = lax.scan(body, (u, lp, grad), jax.random.split(key, nsteps))
        return us

    k0, ks = jax.random.split(jax.random.key(1))
    u0 = 0.1 * jax.random.normal(k0, (nchains, ndim))
    us = np.asarray(jax.jit(jax.vmap(chain))(u0, jax.random.split(ks, nchains)))
    W = us.var(axis=1, ddof=1).mean(axis=0)
    B = us.mean(axis=1).var(axis=0, ddof=1) * nsteps
    gr = np.sqrt(((nsteps - 1.) / nsteps * W + B / nsteps) / W)
    assert np.all(gr < 1.05), gr
    # aggregate moments also correct
    std_ratio = us.reshape(-1, ndim).std(axis=0) / np.sqrt(np.diag(cov))
    assert np.allclose(std_ratio, 1., atol=0.08), std_ratio


@pytest.mark.parametrize('sampler_name', ['NUTSSampler', 'MCMCSampler', 'HMCSampler'])
def test_batch_sample_resume_all_samplers(sampler_name):
    """sample()'s batch loop passes resume=True to run(): every sampler must
    accept it and carry real state over (NUTS/HMC must not redo warmup)."""
    import desilike_tpu.samplers as samplers
    like = GaussianModel()
    cls = getattr(samplers, sampler_name)
    kwargs = dict(nchains=4)
    sampler = cls(like, seed=21, **kwargs)
    run_kwargs = {} if sampler_name == 'MCMCSampler' else dict(nwarmup=200)
    chain = sampler.sample(max_iterations=400, check_every=200, min_iterations=200,
                           max_gr=1.5, min_ess=10, **run_kwargs)
    assert chain.shape[0] >= 200
    assert np.isfinite(chain.mean('a'))


def test_chees_manychain_mixing():
    """ChEES fixed-budget HMC: dense vmapped batch (no per-chain tree
    lockstep), GR ~ 1 at 1024 chains with a short warmup — the many-chain
    scale-out kernel (arXiv:2110.11576; CLAUDE.md known-issue follow-up)."""
    from desilike_tpu.samplers import ChEESSampler
    like = GaussianModel()
    sampler = ChEESSampler(like, seed=13, nchains=1024)
    chain = sampler.run(nsteps=150, nwarmup=200).remove_burnin(0.3)
    cov = analytic_cov()
    for i, name in enumerate(('a', 'b')):
        assert chain.mean(name) == pytest.approx(GaussianModel._mean[i], abs=3 * np.sqrt(cov[i, i]) / 30)
        assert chain.std(name) == pytest.approx(np.sqrt(cov[i, i]), rel=0.1)
    gr = chain.gelman_rubin(('a', 'b'))
    assert np.all(gr < 1.05), gr
    assert 0.4 < sampler.diagnostics['acceptance_rate'] < 0.95
    # resume continues without re-warmup and stays calibrated
    more = sampler.run(nsteps=50, resume=True)
    assert more['a'].shape[0] == 50
    assert np.isfinite(np.asarray(more['logposterior'])).all()


def test_chees_phase_b_eps_retune_reaches_target():
    """Regression (ADVICE r3): phase B's dual-averaged step size was
    discarded (eps_bar gated on the variance-collection counter, which
    phase B never increments), leaving sampling eps at the Gaussian
    rescale-heuristic value. On a non-Gaussian target with anisotropic
    hessian-vs-variance mass mismatch that heuristic lands far from the
    acceptance target (measured 0.96 vs 0.651); the retune brings it back."""
    from desilike_tpu.likelihoods import BaseLikelihood
    from desilike_tpu.samplers import ChEESSampler

    class QuarticModel(BaseLikelihood):
        _params = dict(BaseLikelihood._params)
        _params.update({
            'a': dict(value=0., prior=dict(limits=[-8, 8]), ref=dict(dist='norm', loc=0., scale=1.0)),
            'b': dict(value=0., prior=dict(limits=[-1, 1]), ref=dict(dist='norm', loc=0., scale=0.1)),
        })

        def calculate(self, a=0., b=0., **kw):
            s = 0.05
            self.loglikelihood = -0.5 * a ** 2 - 0.5 * (b / s) ** 4

    like = QuarticModel()
    sampler = ChEESSampler(like, seed=17, nchains=256)
    chain = sampler.run(nsteps=150, nwarmup=200)
    # with the bug the heuristic eps gives ~0.96 acceptance; retuned ~0.69
    assert 0.5 < sampler.diagnostics['acceptance_rate'] < 0.9
    assert np.isfinite(np.asarray(chain['logposterior'])).all()


def test_nuts_jitter_trajectory_mixing():
    """trajectory='jitter': NUTS warmup + dense fixed-budget jittered-HMC
    sampling (the many-chain lockstep-tax fix). Posterior moments and GR
    match the tree-based sampler's quality."""
    from desilike_tpu.samplers import NUTSSampler
    like = GaussianModel()
    sampler = NUTSSampler(like, seed=29, nchains=256, trajectory='jitter')
    assert sampler.trajectory == 'jitter'
    chain = sampler.run(nsteps=200, nwarmup=200).remove_burnin(0.3)
    assert sampler.diagnostics['jitter_path_length'] >= 1.
    assert chain.attrs['sampler'] == 'nuts-jitter'
    cov = analytic_cov()
    for i, name in enumerate(('a', 'b')):
        assert chain.mean(name) == pytest.approx(GaussianModel._mean[i], abs=3 * np.sqrt(cov[i, i]) / 30)
        assert chain.std(name) == pytest.approx(np.sqrt(cov[i, i]), rel=0.1)
    gr = chain.gelman_rubin(('a', 'b'))
    assert np.all(gr < 1.05), gr
    assert sampler.diagnostics['divergence_rate'] < 0.01
    # default selection: many chains -> jitter, few -> tree NUTS
    assert NUTSSampler(like, nchains=2048).trajectory == 'jitter'
    assert NUTSSampler(like, nchains=8).trajectory == 'nuts'


def _synthetic_chain(vals):
    """vals: (nsteps, nchains, 2) -> Chain with params a, b."""
    from desilike_tpu.samples.chain import Chain
    chain = Chain()
    chain['a'] = vals[..., 0]
    chain['b'] = vals[..., 1]
    chain['logposterior'] = -0.5 * np.sum(vals ** 2, axis=-1)
    return chain


def test_check_suite_catches_drift_and_tail_growth():
    """Deepened check() (VERDICT r3 missing #5, reference
    samplers/base.py:504-726): a synchronized slow drift passes GR + ESS
    (the old stopping rule) but is caught by the Geweke criterion; chains
    with agreeing means but different tails pass diag-GR but are caught by
    the CL-interval GR; everything is recorded in a Diagnostics history
    with stable_over semantics."""
    rng = np.random.default_rng(2)
    nsteps, nchains = 4000, 4
    like = GaussianModel()
    sampler = MCMCSampler(like, nchains=nchains)

    # 1. synchronized slow drift: same 1-sigma ramp in every chain
    vals = rng.standard_normal((nsteps, nchains, 2))
    vals += np.linspace(0., 1.0, nsteps)[:, None, None]
    chain = _synthetic_chain(vals)
    assert sampler.check(chain, max_gr=1.05, min_ess=200)          # old rule: passes
    assert sampler.diagnostics['geweke'] > 3.
    assert not sampler.check(chain, max_gr=1.05, min_ess=200, max_geweke=3.)
    hist = sampler.diagnostics_history
    assert hist['geweke_test'][-1] is False
    assert len(hist['diag_gr']) == 2  # full per-check record kept

    # 2. agreeing means, growing tails: half the chains 30% wider
    sampler2 = MCMCSampler(like, nchains=nchains)
    vals = rng.standard_normal((nsteps, nchains, 2))
    vals[:, 2:] *= 1.3
    chain2 = _synthetic_chain(vals)
    assert sampler2.check(chain2, max_gr=1.05, min_ess=200)        # means agree
    assert not sampler2.check(chain2, max_gr=1.05, min_ess=200, max_cl_gr=1.01)
    # ... while a genuinely converged batch passes the same CL criterion
    sampler3 = MCMCSampler(like, nchains=nchains)
    chain3 = _synthetic_chain(rng.standard_normal((nsteps, nchains, 2)))
    assert sampler3.check(chain3, max_gr=1.05, min_ess=200, max_cl_gr=1.01,
                          max_geweke=3., min_geweke_pvalue=1e-3)

    # 3. stable_over: the criterion must hold for N consecutive checks
    sampler4 = MCMCSampler(like, nchains=nchains)
    assert not sampler4.check(chain3, max_gr=1.05, min_ess=200, stable_over=2)
    assert sampler4.check(chain3, max_gr=1.05, min_ess=200, stable_over=2)

    # 4. IAT stability window: first check has no previous IAT -> dact inf
    sampler5 = MCMCSampler(like, nchains=nchains)
    assert not sampler5.check(chain3, max_dact=0.3)
    assert sampler5.check(chain3, max_dact=0.3)  # identical chain: dact = 0


def _correlated_gaussian_likelihood(ndim=8, rho=0.95, seed=0):
    """Deliberately correlated ndim-param Gaussian posterior (equicorrelated
    covariance), the fixture the learned-covariance proposal is judged on."""
    from desilike_tpu.likelihoods import BaseLikelihood
    cov = (1. - rho) * np.eye(ndim) + rho * np.ones((ndim, ndim))
    cov *= 0.01
    prec = np.linalg.inv(cov)

    names = ['p{:d}'.format(i) for i in range(ndim)]

    class CorrelatedGaussian(BaseLikelihood):
        _params = dict(BaseLikelihood._params)
        for _i, _n in enumerate(names):
            _params[_n] = dict(value=0., prior=dict(limits=[-3, 3]),
                               ref=dict(dist='norm', loc=0., scale=0.1), proposal=0.1)
        del _i, _n

        def calculate(self, **kw):
            x = jnp.stack([kw[n] for n in names])
            self.loglikelihood = -0.5 * x @ jnp.asarray(prec) @ x

    return CorrelatedGaussian(), names, cov


def test_mcmc_learned_covariance_iat():
    """CosmoMC-class proposal (VERDICT r3 missing #4): on a deliberately
    correlated 8-param Gaussian, the pooled learned-covariance proposal must
    beat the scalar-scale sampler by >= 3x in integrated autocorrelation
    time (reference learned BlockProposer, ref mcmc.py:199, 331)."""
    from desilike_tpu.samples.diagnostics import integrated_autocorrelation_time

    def iat_for(adapt):
        like, names, cov = _correlated_gaussian_likelihood()
        sampler = MCMCSampler(like, seed=31, nchains=8, adapt=adapt)
        chain = sampler.run(nsteps=3000).remove_burnin(0.5)
        taus = [integrated_autocorrelation_time(
            np.asarray(chain[n]).T) for n in names]
        return np.mean(taus), chain, names, cov

    tau_cov, chain, names, cov = iat_for('cov')
    tau_scale, _, _, _ = iat_for('scale')
    assert tau_cov * 3. < tau_scale, (tau_cov, tau_scale)
    # and the posterior is still right: marginal stds match the target
    for i, n in enumerate(names[:3]):
        assert chain.std(n) == pytest.approx(np.sqrt(cov[i, i]), rel=0.25)
        assert abs(chain.mean(n)) < 4 * np.sqrt(cov[i, i]) / 10


def test_blocked_mcmc_skips_host_node_on_fast_moves():
    """Footprint-based blocking for host-code pipelines: the slow
    (non-traceable) node is memoized on its parameter footprint, so the
    oversampled fast-block moves never re-run it (reference base.py:737-857
    fast/slow machinery; VERDICT round-2 missing #6)."""
    from desilike_tpu.core import Calculator
    from desilike_tpu.likelihoods import BaseGaussianLikelihood
    from desilike_tpu.samplers import BlockedMCMCSampler

    xgrid = np.linspace(0., 1., 40)

    class SlowHost(Calculator):
        _host_eval = True
        _state_attrs = ['shape']
        _params = {'omega': dict(value=0.3, prior=dict(limits=[0.1, 0.5]),
                                 ref=dict(dist='norm', loc=0.3, scale=0.01), proposal=0.01)}
        ncalls = 0

        def calculate(self, omega=0.3, **kw):
            SlowHost.ncalls += 1
            self.shape = jnp.asarray(np.exp(-float(omega) * xgrid))  # host-side numpy

        def get(self):
            return self.shape

    class HostLike(BaseGaussianLikelihood):
        _params = dict(BaseGaussianLikelihood._params)
        _params.update({'b': dict(value=2., prior=dict(limits=[0.5, 4.]),
                                  ref=dict(dist='norm', loc=2., scale=0.05), proposal=0.02)})

        def initialize(self, **kw):
            self.host = SlowHost()
            super().initialize(data=2. * np.exp(-0.3 * xgrid), covariance=np.eye(40) * 0.01 ** 2)

        def flattheory(self):
            return self._b * self.host.shape

        def calculate(self, b=2., **kw):
            self._b = b
            super().calculate()

    like = HostLike()
    sampler = BlockedMCMCSampler(like, seed=5, nchains=1)
    # blocking detected: omega (touches the host) slow, b fast+oversampled
    blocks = dict((tuple(b), r) for b, r in sampler.blocks)
    assert ('omega',) in blocks and blocks[('omega',)] == 1
    assert ('b',) in blocks and blocks[('b',)] >= 2

    SlowHost.ncalls = 0
    nsteps = 40
    chain = sampler.run(nsteps=nsteps)
    fast_repeat = blocks[('b',)]
    total_moves = nsteps * (1 + fast_repeat)
    # host ran only for slow-block proposals (one per iteration), not for
    # the oversampled fast moves
    assert SlowHost.ncalls <= nsteps + 2, (SlowHost.ncalls, total_moves)
    assert np.isfinite(chain.mean('b'))
    # posterior still lands on the generating point
    assert abs(chain.remove_burnin(0.5).mean('b') - 2.) < 0.05
    assert abs(chain.remove_burnin(0.5).mean('omega') - 0.3) < 0.05


def test_blocked_mcmc_dragging_host_cadence():
    """Neal dragging (VERDICT r3 missing #4, reference mcmc.py:408-424):
    fast parameters take ``drag`` interpolated Metropolis steps per slow
    proposal while the host code still runs at slow-block cadence — one new
    host call per dragged move (both slow endpoints live in run_once's LRU
    across the fast updates)."""
    from desilike_tpu.core import Calculator
    from desilike_tpu.likelihoods import BaseGaussianLikelihood
    from desilike_tpu.samplers import BlockedMCMCSampler

    xgrid = np.linspace(0., 1., 40)

    class SlowHost2(Calculator):
        _host_eval = True
        _state_attrs = ['shape']
        _params = {'omega': dict(value=0.3, prior=dict(limits=[0.1, 0.5]),
                                 ref=dict(dist='norm', loc=0.3, scale=0.01), proposal=0.01)}
        ncalls = 0

        def calculate(self, omega=0.3, **kw):
            SlowHost2.ncalls += 1
            self.shape = jnp.asarray(np.exp(-float(omega) * xgrid))

        def get(self):
            return self.shape

    class HostLike2(BaseGaussianLikelihood):
        _params = dict(BaseGaussianLikelihood._params)
        _params.update({'b': dict(value=2., prior=dict(limits=[0.5, 4.]),
                                  ref=dict(dist='norm', loc=2., scale=0.05), proposal=0.02)})

        def initialize(self, **kw):
            self.host = SlowHost2()
            super().initialize(data=2. * np.exp(-0.3 * xgrid), covariance=np.eye(40) * 0.01 ** 2)

        def flattheory(self):
            return self._b * self.host.shape

        def calculate(self, b=2., **kw):
            self._b = b
            super().calculate()

    like = HostLike2()
    ndrag = 3
    sampler = BlockedMCMCSampler(like, seed=9, nchains=1, drag=ndrag)
    SlowHost2.ncalls = 0
    nsteps = 40
    chain = sampler.run(nsteps=nsteps)
    # each iteration: ONE dragged slow proposal -> ONE new host evaluation;
    # the 2*ndrag interpolated fast evals + oversampled fast moves all hit
    # the footprint memo
    assert SlowHost2.ncalls <= nsteps + 3, SlowHost2.ncalls
    burned = chain.remove_burnin(0.5)
    assert abs(burned.mean('b') - 2.) < 0.05
    assert abs(burned.mean('omega') - 0.3) < 0.05
