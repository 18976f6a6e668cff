"""Multi-controller distributed path (parallel/distributed.py).

The two-process test launches two local controller processes over the CPU
backend (each with 2 virtual devices), initializes jax.distributed against
a local coordinator, builds the 4-device GLOBAL mesh spanning both
processes, and runs a shard_map psum plus a sharded likelihood batch —
the exact single-program code a multi-host TPU job runs (SURVEY §5; the
reference covers this regime with mpi4py, mpi.py:63-508)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest


_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ['REPO_DIR'])
    import numpy as np
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from desilike_tpu.parallel import distributed

    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
    distributed.initialize(coordinator_address=coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())  # global view

    mesh = distributed.global_mesh()
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    # every process contributes its local block; the global array spans hosts
    nchains = 8
    lo, hi = distributed.local_chain_slice(nchains, mesh)
    assert hi - lo == nchains // nproc
    local = np.arange(lo, hi, dtype='f8')[:, None] * np.ones((1, 3))
    x = distributed.from_process_local(local, mesh)

    @jax.jit
    def total(x):
        def f(block):
            return jax.lax.psum(jnp.sum(block), 'chains')
        return shard_map(f, mesh=mesh, in_specs=P('chains'), out_specs=P())(x)

    got = float(total(x))
    want = 3. * sum(range(nchains))
    assert got == want, (got, want)

    # sharded likelihood batch over the global mesh (the production axis)
    from desilike_tpu.parallel import sharded_vmap_fn

    def logdens(theta):
        return -0.5 * jnp.sum(theta ** 2), jnp.sum(theta)

    fn = sharded_vmap_fn(lambda t: logdens(t), mesh)
    theta = distributed.from_process_local(
        np.linspace(0., 1., (hi - lo) * 3).reshape(hi - lo, 3), mesh)
    lp, aux = fn(theta)
    full = distributed.process_allgather(lp)
    assert full.shape == (nchains,), full.shape
    assert np.all(np.isfinite(full))
    distributed.sync_global_devices('done')
    print('WORKER_OK', pid)
""")


@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    worker = tmp_path / 'worker.py'
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    coord = 'localhost:{}'.format(port)
    env = dict(os.environ, REPO_DIR=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
               XLA_FLAGS='--xla_force_host_platform_device_count=2',
               JAX_PLATFORMS='cpu')
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), '2', coord],
                              env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, 'worker {} failed:\n{}'.format(i, out)
        assert 'WORKER_OK {}'.format(i) in out


def test_single_process_helpers():
    """The same API degrades gracefully to one controller (this box)."""
    import jax
    from desilike_tpu.parallel import distributed

    pid, nproc = jax.process_index(), jax.process_count()
    assert nproc >= 1
    mesh = distributed.global_mesh()
    lo, hi = distributed.local_chain_slice(8 * nproc, mesh)
    assert (hi - lo) == 8
    x = distributed.from_process_local(np.ones((8, 2)), mesh)
    got = distributed.process_allgather(x)
    assert got.shape == (8 * nproc, 2) or got.shape == (8, 2)
    distributed.sync_global_devices('test')
