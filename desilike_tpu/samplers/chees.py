"""ChEES-HMC: fixed-budget adaptive Hamiltonian Monte Carlo for the
many-chain regime.

Vmapped NUTS is lockstep across chains — every chain waits for the deepest
tree in the batch, so at >=1024 chains most of the batch idles (CLAUDE.md
known issue). ChEES-HMC (Hoffman, Radul & Sountsov 2021, arXiv:2110.11576)
removes the tree entirely: ALL chains take the SAME jittered trajectory this
iteration (a shared halton-jittered length), so the vmapped batch is fully
dense, and the trajectory length is adapted from CROSS-CHAIN statistics (the
Change in the Estimator of the Expected Square jump distance criterion) —
exactly the quantity a sharded chain batch computes with one psum.

Reference counterpart: samplers/nuts.py:17 window adaptation (the role NUTS
plays there); this kernel is the TPU-native scale-out alternative.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .nuts import NUTSSampler


class ChEESSampler(NUTSSampler):
    """Adaptive jittered HMC with cross-chain trajectory adaptation.

    Parameters
    ----------
    likelihood : BaseLikelihood
    nchains : int, default=128
        Designed for the many-chain regime (>= 32 chains; the cross-chain
        ChEES gradient estimate needs a healthy batch).
    target_accept : float, default=0.651
        Dual-averaging target (the HMC-optimal 0.651 rather than NUTS' 0.8).
    max_leapfrog : int, default=1024
        Safety bound on leapfrog steps per trajectory.
    """

    def __init__(self, likelihood, nchains=128, target_accept=0.651,
                 max_leapfrog=1024, **kwargs):
        kwargs.setdefault('pool_adaptation', True)
        super().__init__(likelihood, nchains=nchains, target_accept=target_accept, **kwargs)
        self.max_leapfrog = int(max_leapfrog)

    def _build_step(self, lg):
        """One ChEES iteration over the whole chain batch: shared jittered
        trajectory, per-chain leapfrog+MH, cross-chain ChEES/accept stats."""
        ndim = self.ndim
        nchains = self.nchains
        max_leapfrog = self.max_leapfrog

        def leapfrog_chain(u, grad, r, eps, nsteps, inv_mass):
            """nsteps is shared (traced scalar) -> uniform while_loop, no
            per-chain divergence."""

            def body(s):
                u, grad, r, i = s
                r_half = r + 0.5 * eps * grad
                u_new = u + eps * inv_mass * r_half
                lp_new, grad_new = lg(u_new)
                r_new = r_half + 0.5 * eps * grad_new
                return (u_new, grad_new, r_new, i + 1)

            def cond(s):
                return s[3] < nsteps

            u, grad, r, _ = lax.while_loop(cond, body, (u, grad, r, jnp.zeros((), jnp.int32)))
            lp, grad = lg(u)
            return u, lp, grad, r

        def step(state, inp):
            u, lp, grad, eps, log_T, inv_mass, adam = state
            key, it, halton, adapting = inp
            # shared jittered trajectory length (same for every chain)
            T = jnp.exp(log_T)
            traj = halton * T
            nsteps = jnp.clip(jnp.ceil(traj / eps), 1, max_leapfrog).astype(jnp.int32)
            kr, ka = jax.random.split(key)
            r0 = jax.random.normal(kr, (nchains, ndim)) / jnp.sqrt(inv_mass)

            lp0 = lp
            u1, lp1, grad1, r1 = jax.vmap(
                lambda uu, gg, rr: leapfrog_chain(uu, gg, rr, eps, nsteps, inv_mass))(u, grad, r0)
            energy0 = -lp0 + 0.5 * jnp.sum(inv_mass * r0 ** 2, axis=1)
            energy1 = -lp1 + 0.5 * jnp.sum(inv_mass * r1 ** 2, axis=1)
            delta = energy0 - energy1
            delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
            accept_prob = jnp.minimum(1., jnp.exp(delta))
            accept = jnp.log(jax.random.uniform(ka, (nchains,))) < delta
            u_new = jnp.where(accept[:, None], u1, u)
            lp_new = jnp.where(accept, lp1, lp)
            grad_new = jnp.where(accept[:, None], grad1, grad)

            # ChEES criterion (arXiv:2110.11576 eq. 8): cross-chain gradient
            # of the expected squared jump of the CENTERED squared norm
            center0 = u - jnp.mean(u, axis=0)
            center1 = u1 - jnp.mean(u1, axis=0)
            jump = jnp.sum(center1 ** 2, axis=1) - jnp.sum(center0 ** 2, axis=1)
            # d/dT E[jump^2] ∝ jump * (center1 · v1) (arXiv:2110.11576, eq. 8):
            # a single jump factor, so negative-jump chains contribute with the
            # correct sign to the trajectory-length adaptation.
            dtraj = jnp.sum(center1 * (inv_mass * r1), axis=1)
            w = accept_prob / jnp.maximum(jnp.sum(accept_prob), 1e-12)
            # diverged chains have w == 0 but jump/dtraj == nan; 0 * nan = nan
            # would poison the Adam state permanently — mask them out
            contrib = jnp.where(jnp.isfinite(jump) & jnp.isfinite(dtraj),
                                w * jump * dtraj, 0.)
            chees_grad = jnp.sum(contrib) * halton  # d/d log T direction

            # Adam on log T (only while adapting)
            m, v, t = adam
            g = -chees_grad  # ascend the criterion
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g ** 2
            t = t + 1.
            mhat = m / (1. - 0.9 ** t)
            vhat = v / (1. - 0.999 ** t)
            log_T_new = log_T - 0.025 * mhat / (jnp.sqrt(vhat) + 1e-8)
            log_T = jnp.where(adapting, log_T_new, log_T)
            # keep T sane relative to eps
            log_T = jnp.clip(log_T, jnp.log(eps), jnp.log(eps * max_leapfrog))

            stats = {'accept_prob': jnp.mean(accept_prob), 'nsteps': nsteps,
                     'delta_energy': jnp.mean(jnp.abs(delta))}
            record = {'u': u_new, 'logposterior': lp_new}
            return (u_new, lp_new, grad_new, eps, log_T, inv_mass, (m, v, t)), (record, stats)

        return step

    def run(self, nsteps=1000, nwarmup=None, thin=1, resume=False):
        if nwarmup is None:
            nwarmup = max(300, nsteps // 2)
        ndim = self.ndim
        lg = self._logdens_grad()
        step = self._build_step(lg)
        target = self.target_accept
        resume = resume and getattr(self, '_state', None) is not None

        if not resume:
            x0, _ = self.get_start(self.nchains)
            u0 = jnp.asarray(np.array([self._unconstrain(np.asarray(x)) for x in x0]))
            from ..config import host_eval
            with host_eval():
                u_med = jnp.median(u0, axis=0)
                hdiag = jnp.diagonal(jax.hessian(lambda uu: lg(uu)[0])(u_med))
                mass0 = jnp.clip(jnp.where(hdiag < -1e-12, -1. / hdiag, 1.), 1e-12, 1e12)
            inv_mass0 = jnp.asarray(np.asarray(mass0))
            u0 = self._shard_chains(u0)

        # quasi-random trajectory jitter, shared across chains per iteration
        def halton(i, base=2):
            f, r, ii = 1., 0., i
            for _ in range(20):
                f = f / base
                r = r + f * (ii % base)
                ii = ii // base
            return max(r, 1e-3)

        h_warm = np.array([halton(i + 1) for i in range(nwarmup)])
        h_samp = np.array([halton(i + 1) for i in range(nwarmup, nwarmup + nsteps)])

        nw1 = int(np.ceil(0.7 * nwarmup))
        nw2 = nwarmup - nw1

        def run_all(u0, inv_mass0, eps0, log_T0, keys_warm, keys_samp, h_warm, h_samp):
            lp0, grad0 = jax.vmap(lg)(u0)
            adam0 = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))

            # --- warmup, two phases (Stan-style windows): ---
            # A) dual-averaging eps + ChEES T with the initial (hessian) mass,
            #    collecting the cross-chain variance over the last third only
            #    (chains start at the ref spread, several sigma wide — early
            #    variance overestimates the posterior scales);
            # B) swap in the measured mass, then RE-run a short eps window
            #    against it: a step size tuned near the leapfrog stability
            #    boundary for one metric falls off the acceptance cliff under
            #    another, so eps must be re-tuned after any mass change.
            def warm_phase(state0, keys, hs, nphase, collect_from):
                eps_in = state0[3]
                mu = jnp.log(10.) + jnp.log(eps_in)
                da0 = (jnp.log(eps_in), jnp.log(eps_in), jnp.zeros(()))
                wf0 = (jnp.zeros(ndim), jnp.zeros(()))

                def body(carry, inp):
                    state, da, wf, i = carry
                    key, h = inp
                    state, (_, stats) = step(state, (key, i, h, jnp.asarray(True)))
                    # dual averaging on the cross-chain mean accept
                    log_eps, log_eps_bar, h_bar = da
                    a = stats['accept_prob']
                    t = i + 1.
                    h_bar = (1. - 1. / (t + 10.)) * h_bar + (target - a) / (t + 10.)
                    log_eps = mu - jnp.sqrt(t) / 0.05 * h_bar
                    w_t = t ** -0.75
                    log_eps_bar = w_t * log_eps + (1. - w_t) * log_eps_bar
                    var_sum, cnt = wf
                    collect = i >= collect_from
                    bvar = jnp.var(state[0], axis=0)
                    var_sum = var_sum + jnp.where(collect, bvar, 0.)
                    cnt = cnt + jnp.where(collect, 1., 0.)
                    state = (state[0], state[1], state[2], jnp.exp(log_eps), state[4],
                             state[5], state[6])
                    return (state, (log_eps, log_eps_bar, h_bar), (var_sum, cnt), i + 1.), None

                (state, da, wf, _), _ = lax.scan(body, (state0, da0, wf0, 0.), (keys, hs))
                var_sum, cnt = wf
                # eps_bar gates on whether the phase ran ANY iterations
                # (static), NOT on the variance-collection counter: phase B
                # collects no variance (collect_from > nphase) but its whole
                # point is the dual-averaged eps re-tune after the mass swap.
                eps_bar = jnp.exp(da[1]) if nphase > 0 else eps_in
                var = jnp.where(cnt > 2., jnp.clip(var_sum / jnp.maximum(cnt, 1.), 1e-12, 1e12),
                                state0[5])
                return state, eps_bar, var

            state0 = (u0, lp0, grad0, eps0, log_T0, inv_mass0, adam0)
            stateA, epsA, varA = warm_phase(state0, keys_warm[:nw1], h_warm[:nw1],
                                            nw1, 2 * nw1 // 3)
            # phase B: new mass; rescale eps by the metric change (displacement
            # ~ eps*sqrt(inv_mass)) as the re-tuning start point
            scale = jnp.sqrt(jnp.min(stateA[5] / varA)) if nw2 > 0 else 1.
            stateB0 = (stateA[0], stateA[1], stateA[2], epsA * scale, stateA[4],
                       varA, stateA[6])
            if nw2 > 0:
                state, eps_final, _ = warm_phase(stateB0, keys_warm[nw1:], h_warm[nw1:],
                                                 nw2, nw2 + 1)
            else:
                state, eps_final = stateB0, epsA
            inv_mass = state[5]
            u, lp, grad, _, log_T, _, adam = state

            # --- sampling: everything frozen ---
            def samp_body(carry, inp):
                key, h = inp
                carry, (record, stats) = step(carry, (key, 0, h, jnp.asarray(False)))
                return carry, (record, stats)

            state = (u, lp, grad, eps_final, log_T, inv_mass, adam)
            state, (records, stats) = lax.scan(samp_body, state, (keys_samp, h_samp))
            return state, records, stats, eps_final, inv_mass, log_T

        if resume:
            # continue with the adapted kernel: no re-warmup
            u0, inv_mass0 = self._state['u'], self._state['inv_mass']
            eps0 = jnp.asarray(self._state['eps'])
            log_T0 = jnp.asarray(self._state['log_T'])
            nwarmup = 0
            h_warm = np.zeros(0)
        else:
            eps0 = 0.1 * jnp.min(jnp.sqrt(inv_mass0))
            log_T0 = jnp.log(eps0 * 16.)
        keys_warm = (jax.random.split(self._next_key(), nwarmup) if nwarmup
                     else jax.random.split(self._next_key(), 1)[:0])
        keys_samp = jax.random.split(self._next_key(), nsteps)
        run_all = self._cached_jit(('chees-run', nsteps, nwarmup, bool(resume)),
                                   lambda: jax.jit(run_all))
        state, records, stats, eps, inv_mass, log_T = run_all(
            u0, inv_mass0, eps0, log_T0, keys_warm, keys_samp, jnp.asarray(h_warm), jnp.asarray(h_samp))
        jax.block_until_ready(state[0])
        self._state = {'u': state[0], 'inv_mass': inv_mass, 'eps': eps, 'log_T': log_T}
        self.diagnostics['step_size'] = float(eps)
        self.diagnostics['trajectory_length'] = float(np.exp(np.asarray(log_T)))
        self.diagnostics['acceptance_rate'] = float(np.mean(np.asarray(stats['accept_prob'])))
        self.diagnostics['mean_leapfrog'] = float(np.mean(np.asarray(stats['nsteps'])))

        u_rec = records['u'][::thin]
        x_rec = jax.vmap(jax.vmap(lambda uu: self._constrain(uu)[0]))(u_rec)
        lp_rec = records['logposterior'][::thin]
        if self.mesh is not None:
            self._mesh_gelman_rubin(x_rec)
        return self._make_chain(np.asarray(x_rec), {'logposterior': np.asarray(lp_rec)},
                                attrs={'sampler': 'chees',
                                       'step_size': self.diagnostics['step_size'],
                                       'trajectory_length': self.diagnostics['trajectory_length'],
                                       'acceptance_rate': self.diagnostics['acceptance_rate']})
