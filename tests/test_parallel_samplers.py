"""Mesh-sharded samplers: chains distributed over a device mesh must give
bit-identical results to the single-device run (layout-independent
determinism, SURVEY.md §2.11), with on-device Gelman-Rubin collectives."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.likelihoods import BaseGaussianLikelihood
from desilike_tpu.parallel import make_mesh


class LineModel(BaseGaussianLikelihood):
    _params = dict(BaseGaussianLikelihood._params)
    _params.update({
        'a': dict(value=1.0, prior=dict(limits=[-4, 4]), ref=dict(dist='norm', loc=1.0, scale=0.2)),
        'b': dict(value=-0.5, prior=dict(limits=[-4, 4]), ref=dict(dist='norm', loc=-0.5, scale=0.2)),
    })

    def initialize(self, **kwargs):
        self.x = np.linspace(-1, 1, 50)
        super().initialize(data=1.0 * self.x - 0.5, covariance=np.eye(50) * 0.04)

    def flattheory(self):
        return self._a * jnp.asarray(self.x) + self._b

    def calculate(self, a=1., b=0., **kw):
        self._a, self._b = a, b
        super().calculate()


def _positions(chain, names=('a', 'b')):
    return np.stack([np.asarray(chain[n]) for n in names], axis=-1)


@pytest.mark.parametrize('sampler_name,kwargs,run_kwargs', [
    ('NUTSSampler', dict(nchains=8, max_depth=5), dict(nsteps=80, nwarmup=100)),
    ('MCMCSampler', dict(nchains=8), dict(nsteps=200)),
    ('HMCSampler', dict(nchains=8, nleapfrog=8), dict(nsteps=80, nwarmup=100)),
    ('EnsembleSampler', dict(nwalkers=32), dict(nsteps=100)),
    ('ChEESSampler', dict(nchains=32), dict(nsteps=60, nwarmup=80)),
    ('NUTSSampler', dict(nchains=32, max_depth=5, trajectory='jitter'),
     dict(nsteps=60, nwarmup=80)),
])
def test_mesh_sharded_chains(sampler_name, kwargs, run_kwargs):
    """Determinism contract: same (seed, mesh) -> bit-identical chains; a
    1-device mesh is bit-identical to no mesh. Across layouts (8-device vs
    unsharded) bits are NOT guaranteed — XLA blocks the vmapped matmuls by
    per-device batch, and ULP differences are chaotically amplified by
    accept/reject branches — so cross-layout agreement is statistical."""
    import desilike_tpu.samplers as samplers
    assert len(jax.devices()) >= 8, 'conftest must provide 8 virtual devices'
    cls = getattr(samplers, sampler_name)
    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)

    chains = {}
    for label, mesh in [('none', None), ('1dev', mesh1), ('8dev', mesh8), ('8dev_rerun', mesh8)]:
        sampler = cls(LineModel(), seed=123, mesh=mesh, **kwargs)
        chains[label] = sampler.run(**run_kwargs)
        if mesh is not None and sampler_name != 'EnsembleSampler':
            gr = sampler.diagnostics.get('gelman_rubin_mesh')
            assert gr is not None and np.all(np.isfinite(gr))
    ref = _positions(chains['none'])
    np.testing.assert_array_equal(_positions(chains['1dev']), ref,
                                  err_msg='1-device mesh differs from unsharded')
    np.testing.assert_array_equal(_positions(chains['8dev_rerun']), _positions(chains['8dev']),
                                  err_msg='same seed+mesh not reproducible')
    # cross-layout: same posterior (half the retained samples, loose moments)
    p8 = _positions(chains['8dev'])
    n = ref.shape[0] // 2
    for i in range(ref.shape[-1]):
        a, b = ref[n:, ..., i].ravel(), p8[n:, ..., i].ravel()
        assert abs(a.mean() - b.mean()) < 5. * b.std() / np.sqrt(50.), (sampler_name, i)
        assert 0.5 < a.std() / b.std() < 2., (sampler_name, i)


def test_mesh_rejects_indivisible_batch():
    from desilike_tpu.samplers import MCMCSampler
    sampler = MCMCSampler(LineModel(), seed=1, nchains=6, mesh=make_mesh(4))
    with pytest.raises(ValueError, match='divisible'):
        sampler.run(nsteps=10)


def test_chain_gelman_rubin_matches_host():
    from desilike_tpu.parallel import chain_gelman_rubin
    rng = np.random.default_rng(3)
    x = rng.normal(size=(200, 8, 3))
    gr_dev = np.asarray(jax.jit(chain_gelman_rubin)(jnp.asarray(x)))
    nsteps = x.shape[0]
    W = x.var(axis=0, ddof=1).mean(axis=0)
    B = nsteps * x.mean(axis=0).var(axis=0, ddof=1)
    gr_host = np.sqrt(((nsteps - 1.) / nsteps * W + B / nsteps) / W)
    np.testing.assert_allclose(gr_dev, gr_host, rtol=1e-5)
