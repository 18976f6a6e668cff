"""Config 5 (scaled down for CPU): MLP-emulated theory, many vmapped NUTS
chains, autodiff Fisher; plus multi-chip sharding on the virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.theories import ShapeFitPowerSpectrumTemplate
from desilike_tpu.theories.full_shape import EFTLikeKaiserTracerPowerSpectrumMultipoles
from desilike_tpu.observables import TracerPowerSpectrumMultipolesObservable, BoxFootprint
from desilike_tpu.likelihoods import ObservablesGaussianLikelihood
from desilike_tpu.emulators import Emulator, MLPEmulatorEngine
from desilike_tpu.samplers import NUTSSampler
from desilike_tpu.fisher import Fisher


def make_likelihood(template):
    theory = EFTLikeKaiserTracerPowerSpectrumMultipoles(
        ells=(0, 2), template=template, mu=6)
    theory.init.params = {'ct*': dict(derived='.marg'), 'sn*': dict(derived='.marg')}
    obs = TracerPowerSpectrumMultipolesObservable(
        data={'b1': 1.9}, klim={0: (0.02, 0.2, 0.01), 2: (0.02, 0.2, 0.01)}, theory=theory)
    return ObservablesGaussianLikelihood(
        observables=[obs], footprints=[BoxFootprint(volume=1e10, nbar=1e-3)])


def test_emulated_nuts_and_fisher():
    template = ShapeFitPowerSpectrumTemplate(z=0.8, k=np.geomspace(1e-3, 0.6, 300))
    emu = Emulator(template, engine=MLPEmulatorEngine(hidden=(48, 48), nsamples=192, nsteps=1200)).fit()
    assert emu.check(ntests=3) < 0.05
    like = make_likelihood(emu.to_calculator())
    pipe = like.pipeline
    assert {'qpar', 'qper', 'df', 'dm'} <= set(pipe.varied_params.names())

    # many vmapped NUTS chains (CPU-scaled; bench runs 4096 on chip)
    sampler = NUTSSampler(like, seed=21, nchains=8, max_depth=6)
    chain = sampler.run(nsteps=150, nwarmup=200).remove_burnin(0.3)
    assert sampler.diagnostics['divergence_rate'] < 0.05
    # autodiff Fisher on the emulated likelihood matches the exact one
    fisher = Fisher(like)()
    like_exact = make_likelihood(ShapeFitPowerSpectrumTemplate(z=0.8, k=np.geomspace(1e-3, 0.6, 300)))
    fisher_exact = Fisher(like_exact)()
    for name in ('qpar', 'dm', 'df', 'b1'):
        ratio = fisher.std(name) / fisher_exact.std(name)
        assert 0.7 < ratio < 1.4, (name, ratio)
    # posterior centered on truth within ~2 sigma
    for name, truth in [('qpar', 1.0), ('df', 1.0), ('dm', 0.0), ('b1', 1.9)]:
        assert abs(chain.mean(name) - truth) < 3 * chain.std(name), name


def test_sharded_likelihood_matches_unsharded():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    template = ShapeFitPowerSpectrumTemplate(z=0.8, k=np.geomspace(1e-3, 0.6, 200))
    like = make_likelihood(template)
    pipe = like.pipeline
    raw = like.logpost_fn(jit=False)
    names = pipe.varied_params.names()

    def flat(theta):
        lp, _ = raw(dict(zip(names, theta)))
        return lp

    nbatch = 32
    rng = np.random.default_rng(0)
    center = {p.name: p.value for p in pipe.varied_params}
    center['b1'] = 1.9  # the injected truth: keeps chi2 ~ O(1), f32-friendly
    thetas = np.tile([center[n] for n in names], (nbatch, 1))
    thetas += 0.002 * rng.standard_normal(thetas.shape)
    thetas = jnp.asarray(thetas, dtype=jnp.float32)

    plain = jax.jit(jax.vmap(flat))(thetas)

    devices = jax.devices()
    assert len(devices) >= 8, 'conftest should provide 8 virtual CPU devices'
    mesh = Mesh(np.array(devices[:8]), ('chains',))
    sharding = NamedSharding(mesh, P('chains'))
    sharded_in = jax.device_put(thetas, sharding)
    sharded_fn = jax.jit(jax.vmap(flat), in_shardings=(sharding,), out_shardings=sharding)
    sharded = sharded_fn(sharded_in)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded), rtol=1e-3, atol=1e-2)
