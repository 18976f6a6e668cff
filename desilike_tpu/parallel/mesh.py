"""Device-mesh utilities: sharded batch evaluation of likelihoods.

TPU-native replacement for the reference's MPI backend (desilike/mpi.py):
the reference's Scatterv/loop/reduce over ranks (base.py:291-378 vmap-mpi)
becomes a sharding annotation — chains/evaluation batches are laid out over
a 1D 'chains' mesh axis and XLA inserts the collectives. Determinism comes
from counter-based jax.random keys folded over mesh coordinates instead of
rank-dependent seeding (SURVEY.md §2.11).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis='chains', devices=None):
    """1D mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError('requested a {}-device mesh but only {} devices are '
                                 'available (set xla_force_host_platform_device_count '
                                 'for virtual CPU devices)'.format(n_devices, len(devices)))
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(values, mesh, axis='chains'):
    """Place a batch pytree (leading axis = batch) on the mesh, sharded over
    the batch dimension."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda v: jax.device_put(v, sharding), values)


def sharded_vmap_fn(fn, mesh, axis='chains'):
    """jit(vmap(fn)) with the batch dimension sharded over the mesh.

    fn: theta-dict -> (logpost, aux). Returns a function over batched dicts
    whose leading axis is distributed; XLA partitions the computation with
    no communication (embarrassingly parallel over evaluations, the
    reference's dominant axis, SURVEY.md §2.11).
    """
    vfn = jax.vmap(fn)
    in_sharding = NamedSharding(mesh, P(axis))
    out_sharding = NamedSharding(mesh, P(axis))
    return jax.jit(vfn, in_shardings=(in_sharding,), out_shardings=(out_sharding, out_sharding))


def fold_keys(key, n, mesh=None):
    """n per-chain keys from one root key — bit-reproducible regardless of
    how chains are laid out on the mesh."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))


def chain_gelman_rubin(x):
    """Split-R statistic from on-device positions, pure jnp.

    x : (nsteps, nchains, ndim). Under jit with x sharded over the 'chains'
    mesh axis, the cross-chain mean/variance reductions compile to XLA
    collectives (psum over ICI) — the multi-chip convergence check never
    gathers chains to the host (reference Diagnostics via mpi gather,
    samplers/base.py:504, redesigned)."""
    nsteps = x.shape[0]
    within = jnp.mean(jnp.var(x, axis=0, ddof=1), axis=0)
    between = nsteps * jnp.var(jnp.mean(x, axis=0), axis=0, ddof=1)
    var = (nsteps - 1.) / nsteps * within + between / nsteps
    return jnp.sqrt(var / within)
