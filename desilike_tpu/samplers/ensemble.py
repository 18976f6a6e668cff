"""Ensemble samplers: affine-invariant stretch move (Goodman & Weare 2010)
and differential ensemble slice sampling (Karamanis & Beutler 2020).

In-framework replacements for the reference's emcee and zeus bindings
(samplers/emcee.py:8, samplers/zeus.py:12), fully on-device: the walker
ensemble is a batch axis, one lax.scan step updates both half-ensembles,
thousands of walkers per chip.
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

        def scan_all(state, keys):
            return lax.scan(step, state, keys)

        scan_fn = self._cached_jit(('ensemble-run', nsteps), lambda: jax.jit(scan_all))
        state0 = (start, lp0, aux0, jnp.zeros((), dtype=jnp.int32))
        (xf, lpf, auxf, naccept), records = scan_fn(state0, keys)
        jax.block_until_ready(lpf)
        self._state = (xf, lpf, auxf, naccept)
        self.diagnostics['acceptance_rate'] = float(naccept) / (nsteps * self.nwalkers)
        x = records.pop('x')
        sl = slice(burnin, None, thin)
        chain = self._make_chain(x[sl], {k: v[sl] for k, v in records.items()},
                                 attrs={'sampler': 'ensemble', 'acceptance_rate': self.diagnostics['acceptance_rate']})
        return chain


class EnsembleSliceSampler(BasePosteriorSampler):
    """Differential ensemble slice sampler (Karamanis & Beutler 2020,
    arXiv:2002.06212 — the reference's zeus binding, samplers/zeus.py:12).

    Each walker slice-samples along a direction mu*(x_a - x_b) drawn from
    the complementary half-ensemble: affine-invariant, tuning-free, and
    every expansion/shrink evaluation is one vmapped batch over the moving
    half (TPU-friendly fixed-shape inner loops).

    Parameters
    ----------
    likelihood : BaseLikelihood
    nwalkers : int, default=max(64, 2*ndim rounded up to even)
    mu : float, default=1.
        Direction scale.
    maxsteps : int, default=16
        Bound on stepping-out expansions + shrinks per walker move.
    """

    def __init__(self, likelihood, nwalkers=None, mu=1., maxsteps=16, **kwargs):
        super().__init__(likelihood, **kwargs)
        if nwalkers is None:
            nwalkers = max(64, 2 * ((self.ndim + 1) // 2) * 2)
        if nwalkers % 2:
            raise ValueError('nwalkers must be even')
        self.nwalkers = int(nwalkers)
        self.mu = float(mu)
        self.maxsteps = int(maxsteps)

    def _build_step(self):
        mu = self.mu
        half = self.nwalkers // 2
        maxsteps = self.maxsteps
        logpost_one = lambda t: self.logpost_flat(t)

        def move_one(key, x0, lp0, x_other):
            """One slice move for a single walker (vmapped over the half)."""
            ka, kb, ku, kw, ks = jax.random.split(key, 5)
            ia = jax.random.randint(ka, (), 0, half)
            ib = jax.random.randint(kb, (), 0, half - 1)
            ib = jnp.where(ib >= ia, ib + 1, ib)  # distinct pair
            d = mu * (x_other[ia] - x_other[ib])
            logy = lp0 + jnp.log(jax.random.uniform(ku))
            # initial unit bracket placed uniformly around t=0
            left0 = -jax.random.uniform(kw)
            right0 = left0 + 1.

            def cond_exp(st):
                left, right, expand_left, expand_right, it = st
                return (expand_left | expand_right) & (it < maxsteps)

            def body_exp(st):
                left, right, expand_left, expand_right, it = st
                lpl, _ = logpost_one(x0 + left * d)
                lpr, _ = logpost_one(x0 + right * d)
                expand_left = expand_left & (lpl > logy)
                expand_right = expand_right & (lpr > logy)
                left = jnp.where(expand_left, left - 1., left)
                right = jnp.where(expand_right, right + 1., right)
                return (left, right, expand_left, expand_right, it + 1)

            left, right, _, _, nexp = lax.while_loop(
                cond_exp, body_exp, (left0, right0, jnp.asarray(True), jnp.asarray(True), jnp.asarray(0)))

            def cond_shr(st):
                done = st[4]
                return (~done) & (st[5] < maxsteps)

            def body_shr(st):
                left, right, t, key, done, it, x_cur, lp_cur, aux_cur = st
                key, kt = jax.random.split(key)
                t = jax.random.uniform(kt, minval=left, maxval=right)
                x_new = x0 + t * d
                lp_new, aux_new = logpost_one(x_new)
                accept = lp_new > logy
                left = jnp.where(accept | (t >= 0.), left, t)
                right = jnp.where(accept | (t < 0.), right, t)
                x_cur = jnp.where(accept, x_new, x_cur)
                lp_cur = jnp.where(accept, lp_new, lp_cur)
                aux_cur = jax.tree.map(lambda n, o: jnp.where(accept, n, o), aux_new, aux_cur)
                return (left, right, t, key, done | accept, it + 1, x_cur, lp_cur, aux_cur)

            _, aux0 = logpost_one(x0)
            st = (left, right, jnp.zeros(()), ks, jnp.asarray(False), jnp.asarray(0), x0, lp0, aux0)
            st = lax.while_loop(cond_shr, body_shr, st)
            accepted = st[4]
            return st[6], st[7], st[8], accepted, nexp + st[5]

        def step(state, key):
            x, lp, aux, naccept, ncall = state
            ka, kb = jax.random.split(key)
            xa, xb = x[:half], x[half:]
            lpa, lpb = lp[:half], lp[half:]
            keys_a = jax.random.split(ka, half)
            xa, lpa, auxa, acc_a, nc_a = jax.vmap(lambda k, x0, l0: move_one(k, x0, l0, xb))(keys_a, xa, lpa)
            keys_b = jax.random.split(kb, half)
            xb, lpb, auxb, acc_b, nc_b = jax.vmap(lambda k, x0, l0: move_one(k, x0, l0, xa))(keys_b, xb, lpb)
            x = jnp.concatenate([xa, xb])
            lp = jnp.concatenate([lpa, lpb])
            aux = jax.tree.map(lambda va, vb: jnp.concatenate([va, vb]), auxa, auxb)
            naccept = naccept + jnp.sum(acc_a) + jnp.sum(acc_b)
            ncall = ncall + jnp.sum(nc_a) + jnp.sum(nc_b)
            record = {'x': x, 'logposterior': lp, **aux}
            return (x, lp, aux, naccept, ncall), record

        return step

    def run(self, nsteps=300, thin=1, burnin=0, resume=False):
        """Run the slice ensemble; returns a Chain of shape (nsteps_kept, nwalkers)."""
        if resume and getattr(self, '_state', None) is not None:
            start, lp0, _, _ = self._state[:4]
        else:
            start, lp0 = self.get_start(self.nwalkers)
            start, lp0 = self._shard_chains(start, lp0)
        step = self._build_step()
        keys = jax.random.split(self._next_key(), nsteps)

        def scan_all(state, keys):
            return lax.scan(step, state, keys)

        scan_fn = self._cached_jit(('ensemble-slice-run', nsteps), lambda: jax.jit(scan_all))
        _, aux0 = self.logpost_batch(start)
        state0 = (start, lp0, aux0, jnp.zeros((), dtype=jnp.int32), jnp.zeros((), dtype=jnp.int32))
        (xf, lpf, auxf, naccept, ncall), records = scan_fn(state0, keys)
        jax.block_until_ready(lpf)
        self._state = (xf, lpf, auxf, naccept)
        self.diagnostics['acceptance_rate'] = float(naccept) / (nsteps * self.nwalkers)
        self.diagnostics['ncall'] = int(ncall) + self.nwalkers
        x = records.pop('x')
        sl = slice(burnin, None, thin)
        return self._make_chain(x[sl], {k: v[sl] for k, v in records.items()},
                                attrs={'sampler': 'ensemble_slice',
                                       'acceptance_rate': self.diagnostics['acceptance_rate']})
