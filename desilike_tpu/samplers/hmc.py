"""Static HMC and microcanonical Langevin (MCLMC) samplers.

Counterparts of the reference's blackjax bindings (samplers/hmc.py:17,
mclmc.py:9), implemented in-framework on the same vmapped/scanned
infrastructure as NUTS.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .nuts import NUTSSampler, _kinetic


class HMCSampler(NUTSSampler):
    """Static-trajectory HMC with jittered step count, dual-averaging step
    size and Welford mass adaptation (shares the NUTS warmup machinery)."""

    def __init__(self, likelihood, nleapfrog=32, **kwargs):
        super().__init__(likelihood, **kwargs)
        self.nleapfrog = int(nleapfrog)

    def _make_kernel(self, lg):
        ndim = self.ndim
        nleap = self.nleapfrog

        def one_step(key, z0, lp0, grad0, eps, inv_mass):
            k_mom, k_jit, k_acc = jax.random.split(key, 3)
            r0 = jax.random.normal(k_mom, (ndim,)) / jnp.sqrt(inv_mass)
            nstep = jax.random.randint(k_jit, (), nleap // 2, nleap + 1)

            def leap(carry, i):
                z, r, lp, grad = carry
                do = i < nstep
                r_half = r + 0.5 * eps * grad
                z_new = z + eps * inv_mass * r_half
                lp_new, grad_new = lg(z_new)
                r_new = r_half + 0.5 * eps * grad_new
                out = (jnp.where(do, z_new, z), jnp.where(do, r_new, r),
                       jnp.where(do, lp_new, lp),
                       jnp.where(do[..., None] if np.ndim(do) else do, grad_new, grad))
                return out, None

            (z, r, lp, grad), _ = lax.scan(leap, (z0, r0, lp0, grad0), jnp.arange(nleap))
            h0 = -lp0 + _kinetic(r0, inv_mass)
            h1 = -lp + _kinetic(r, inv_mass)
            log_accept = jnp.where(jnp.isnan(h1), -jnp.inf, h0 - h1)
            accept = jnp.log(jax.random.uniform(k_acc)) < log_accept
            z_out = jnp.where(accept, z, z0)
            lp_out = jnp.where(accept, lp, lp0)
            grad_out = jnp.where(accept, grad, grad0)
            stats = dict(accept_stat=jnp.clip(jnp.exp(log_accept), 0., 1.),
                         depth=jnp.zeros((), jnp.int32), diverging=jnp.isnan(h1),
                         n_leaves=nstep)
            return z_out, lp_out, grad_out, stats
        return one_step


class MCLMCSampler(NUTSSampler):
    r"""Unadjusted microcanonical Langevin Monte Carlo (Robnik & Seljak 2022,
    arXiv:2212.08549): energy-conserving dynamics on the sphere of momenta
    with partial refresh; very high ESS/gradient for smooth posteriors.

    Unadjusted: has an O(eps^2) discretization bias; use NUTS when exactness
    matters, MCLMC for speed at scale.
    """

    def __init__(self, likelihood, L=None, step_size=None, **kwargs):
        super().__init__(likelihood, **kwargs)
        self.L = L
        self.step_size = step_size

    def run(self, nsteps=2000, nwarmup=500, thin=1, resume=False):
        ndim = self.ndim
        lg = self._logdens_grad()
        d = max(ndim, 2)
        resume = resume and getattr(self, '_state', None) is not None

        def vel_update(u, g, eps):
            # ESH velocity map: rotate u towards the normalized force
            gnorm = jnp.sqrt(jnp.sum(g * g) + 1e-30)
            e = g / gnorm
            delta = eps * gnorm / (d - 1)
            ue = jnp.sum(u * e)
            ch, sh = jnp.cosh(delta), jnp.sinh(delta)
            u_new = (u + e * (sh + ue * (ch - 1.))) / (ch + ue * sh)
            return u_new / jnp.sqrt(jnp.sum(u_new ** 2))

        def step(carry, inp):
            u, z, lp, grad, eps, L = carry
            key = inp
            # leapfrog-like: half velocity, position, half velocity
            u = vel_update(u, grad, eps / 2.)
            z = z + eps * u
            lp, grad = lg(z)
            u = vel_update(u, grad, eps / 2.)
            # partial momentum refresh with rate nu = sqrt(2 eps / L (d-1))-ish
            nu = jnp.sqrt(jnp.expm1(2. * eps / L))
            noise = jax.random.normal(key, (ndim,))
            u = (u + nu * noise)
            u = u / jnp.sqrt(jnp.sum(u ** 2))
            return (u, z, lp, grad, eps, L), {'x': z, 'logdens': lp}

        def warm_chain(u_pos, key):
            k1, k2 = jax.random.split(key)
            lp, grad = lg(u_pos)
            u = jax.random.normal(k1, (ndim,))
            u = u / jnp.sqrt(jnp.sum(u ** 2))
            eps0 = jnp.asarray(0.2 * np.sqrt(ndim), dtype=u_pos.dtype) if self.step_size is None else jnp.asarray(self.step_size)
            L0 = jnp.asarray(float(ndim) ** 0.5, dtype=u_pos.dtype) if self.L is None else jnp.asarray(self.L)
            # crude warmup: run, estimate position scale, set L ~ mean std * sqrt(d)
            carry = (u, u_pos, lp, grad, eps0 * 0.1, L0)
            keys = jax.random.split(k2, nwarmup)
            carry, rec = lax.scan(step, carry, keys)
            xs = rec['x']
            scale = jnp.std(xs[nwarmup // 2:], axis=0).mean()
            L = jnp.sqrt(jnp.asarray(float(ndim))) * scale
            eps = scale * 0.5
            u, z, lp, grad, _, _ = carry
            return (u, z, lp, grad, eps, L)

        def sample_chain(carry, key):
            keys = jax.random.split(key, nsteps)
            return lax.scan(step, carry, keys)

        if resume:
            carry = self._state
        else:
            x0, _ = self.get_start(self.nchains)
            u0 = jnp.asarray(np.array([self._unconstrain(np.asarray(x)) for x in x0]))
            keys = jax.random.split(self._next_key(), self.nchains)
            u0, keys = self._shard_chains(u0, keys)
            carry = jax.jit(jax.vmap(warm_chain))(u0, keys)
        keys = self._shard_chains(jax.random.split(self._next_key(), self.nchains))
        sampler_fn = self._cached_jit(('hmc-sample', nsteps),
                                      lambda: jax.jit(jax.vmap(sample_chain)))
        carry, rec = sampler_fn(carry, keys)
        self._state = carry
        xs = jnp.moveaxis(rec['x'], 0, 1)  # (nsteps, nchains, ndim)
        jax.block_until_ready(xs)
        # constrain + evaluate aux on thinned samples
        xs = xs[::thin]
        cons = jax.jit(jax.vmap(jax.vmap(lambda u: self._constrain(u)[0])))(xs)
        lps, aux = jax.jit(jax.vmap(jax.vmap(self.logpost_flat)))(cons)
        records = {'logposterior': lps, **aux}
        return self._make_chain(np.asarray(cons), {k: np.asarray(v) for k, v in records.items()},
                                attrs={'sampler': 'mclmc'})
