"""Multi-controller distributed runtime (multi-host / multi-slice).

TPU-native replacement for the reference's inter-node MPI layer
(desilike/mpi.py:63-508): instead of explicit Gatherv/Scatterv/Bcast between
ranks, every controller process calls :func:`initialize` once, after which
``jax.devices()`` is the GLOBAL device list and a single :func:`global_mesh`
spans all hosts — GSPMD sharding annotations replace the entire gather/
scatter layer, with collectives riding ICI within a slice and DCN across
slices (SURVEY.md §5 "distributed communication backend").

Launch recipe (documented here because this box has one host; the
two-process CPU simulation in tests/test_distributed.py exercises the same
code path):

- TPU pods / multi-slice (GKE, queued resources): just call
  ``initialize()`` — JAX auto-detects the coordinator from the TPU
  environment.
- Manual / SLURM-style CPU or GPU clusters::

      # on every process i of N:
      from desilike_tpu.parallel import distributed
      distributed.initialize(coordinator_address='host0:12345',
                             num_processes=N, process_id=i)
      mesh = distributed.global_mesh()
      sampler = NUTSSampler(likelihood, nchains=4096, mesh=mesh)
      chain = sampler.run(...)   # identical single-program code on every host

Every process runs the same program; chain shards live on the devices each
process controls. Host-side artifacts (chains saved to disk, diagnostics)
use :func:`process_allgather` to materialize global arrays, and
:func:`local_chain_slice` to know which chains this process owns.
"""

import numpy as np
import jax

from .mesh import make_mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Bring up the multi-controller runtime (idempotent).

    With no arguments, defers to JAX's auto-detection (TPU pods, GKE).
    Returns (process_id, num_processes) after initialization.
    """
    if not is_initialized():
        kwargs = {}
        if coordinator_address is not None:
            kwargs.update(coordinator_address=coordinator_address,
                          num_processes=int(num_processes),
                          process_id=int(process_id))
        if local_device_ids is not None:
            kwargs.update(local_device_ids=local_device_ids)
        jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def is_initialized():
    """True once the distributed client is up (or in single-process mode
    where no initialization is needed)."""
    try:
        from jax._src import distributed as _dist
        return _dist.global_state.client is not None
    except Exception:
        return jax.process_count() > 1


def global_mesh(axis='chains', n_devices=None):
    """1D mesh over the GLOBAL device list (every host's devices). With one
    process this is exactly parallel.make_mesh."""
    return make_mesh(n_devices=n_devices, axis=axis, devices=None)


def local_chain_slice(nchains, mesh=None):
    """(start, stop) of the chain indices whose shards live on THIS
    process's devices, for a batch of ``nchains`` sharded over ``mesh``'s
    first axis. Host-side bookkeeping (checkpointing a shard, seeding from
    per-chain entropy) uses this; the compiled program itself never needs
    it."""
    nproc = jax.process_count()
    pid = jax.process_index()
    if nchains % nproc:
        raise ValueError('nchains={} must divide over {} processes'.format(nchains, nproc))
    per = nchains // nproc
    return pid * per, (pid + 1) * per


def from_process_local(local_values, mesh, axis='chains'):
    """Assemble a globally-sharded array from each process's local rows
    (the multi-host analog of mesh.shard_batch): local_values is this
    process's (nchains_local, ...) block."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_values))


def process_allgather(x):
    """Materialize a (possibly multi-host sharded) array on every host as
    plain numpy — the replacement for the reference's MPI gather of chains
    to rank 0 (samplers/base.py:471-478); here every host gets the full
    array (single-program symmetry, no special rank)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def sync_global_devices(tag='desilike_tpu'):
    """Barrier across hosts (replacement for mpi.barrier_idle, mpi.py:594)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)
