"""Affine-invariant ensemble sampler (Goodman & Weare 2010 stretch move).

In-framework replacement for the reference's emcee binding
(samplers/emcee.py:8), fully on-device: the walker ensemble is a batch axis,
one lax.scan step updates both half-ensembles, thousands of walkers per chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .base import BasePosteriorSampler


class EnsembleSampler(BasePosteriorSampler):
    """Stretch-move ensemble sampler.

    Parameters
    ----------
    likelihood : BaseLikelihood
    nwalkers : int, default=max(64, 2*ndim rounded up to even)
    a : float, default=2.
        Stretch scale parameter.
    """

    def __init__(self, likelihood, nwalkers=None, a=2., **kwargs):
        super().__init__(likelihood, **kwargs)
        if nwalkers is None:
            nwalkers = max(64, 2 * ((self.ndim + 1) // 2) * 2)
        if nwalkers % 2:
            raise ValueError('nwalkers must be even')
        self.nwalkers = int(nwalkers)
        self.a = float(a)

    def _build_step(self):
        a = self.a
        ndim = self.ndim
        half = self.nwalkers // 2
        logpost_batch = jax.vmap(lambda t: self.logpost_flat(t))

        def move(key, x_move, lp_move, aux_move, x_other):
            k1, k2, k3 = jax.random.split(key, 3)
            partners = jax.random.randint(k1, (half,), 0, half)
            xp = x_other[partners]
            u = jax.random.uniform(k2, (half,))
            z = ((a - 1.) * u + 1.) ** 2 / a
            y = xp + z[:, None] * (x_move - xp)
            lp_y, aux_y = logpost_batch(y)
            logratio = (ndim - 1.) * jnp.log(z) + lp_y - lp_move
            accept = jnp.log(jax.random.uniform(k3, (half,))) < logratio
            x_new = jnp.where(accept[:, None], y, x_move)
            lp_new = jnp.where(accept, lp_y, lp_move)
            aux_new = jax.tree.map(
                lambda new, old: jnp.where(accept.reshape((half,) + (1,) * (new.ndim - 1)), new, old),
                aux_y, aux_move)
            return x_new, lp_new, aux_new, accept

        def step(state, key):
            x, lp, aux, naccept = state
            ka, kb = jax.random.split(key)
            xa, xb = x[:half], x[half:]
            lpa, lpb = lp[:half], lp[half:]
            auxa = jax.tree.map(lambda v: v[:half], aux)
            auxb = jax.tree.map(lambda v: v[half:], aux)
            xa, lpa, auxa, acc_a = move(ka, xa, lpa, auxa, xb)
            xb, lpb, auxb, acc_b = move(kb, xb, lpb, auxb, xa)
            x = jnp.concatenate([xa, xb])
            lp = jnp.concatenate([lpa, lpb])
            aux = jax.tree.map(lambda va, vb: jnp.concatenate([va, vb]), auxa, auxb)
            naccept = naccept + jnp.sum(acc_a) + jnp.sum(acc_b)
            record = {'x': x, 'logposterior': lp, **aux}
            return (x, lp, aux, naccept), record

        return step

    def run(self, nsteps=500, thin=1, burnin=0, resume=False):
        """Run the ensemble; returns a Chain with shape (nsteps_kept, nwalkers).

        resume=True continues from the final state of the previous run
        (reference batch-resume behavior, samplers/base.py:354-406)."""
        if resume and getattr(self, '_state', None) is not None:
            start, lp0, aux0, _ = self._state
        else:
            start, lp0 = self.get_start(self.nwalkers)
            _, aux0 = self.logpost_batch(start)
            start, lp0, aux0 = self._shard_chains(start, lp0, aux0)
        step = self._build_step()
        keys = jax.random.split(self._next_key(), nsteps)

        @jax.jit
        def scan_all(state, keys):
            return lax.scan(step, state, keys)

        state0 = (start, lp0, aux0, jnp.zeros((), dtype=jnp.int32))
        (xf, lpf, auxf, naccept), records = scan_all(state0, keys)
        jax.block_until_ready(lpf)
        self._state = (xf, lpf, auxf, naccept)
        self.diagnostics['acceptance_rate'] = float(naccept) / (nsteps * self.nwalkers)
        x = records.pop('x')
        sl = slice(burnin, None, thin)
        chain = self._make_chain(x[sl], {k: v[sl] for k, v in records.items()},
                                 attrs={'sampler': 'ensemble', 'acceptance_rate': self.diagnostics['acceptance_rate']})
        return chain
