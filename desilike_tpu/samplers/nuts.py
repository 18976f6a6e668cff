"""No-U-Turn sampler, in-framework, fully on-device and vmappable.

In-framework replacement for the reference's blackjax binding
(samplers/nuts.py:17). Iterative multinomial NUTS (Hoffman & Gelman 2014,
algorithm 3 with multinomial trajectory sampling a la Betancourt 2017):

- tree doubling with the checkpoint scheme for sub-tree U-turn checks
  (store even leaves at slot popcount(j); at leaf i check subtrees of size
  2^k for every k with 2^k | (i+1) against the stored left edges),
- diagonal mass matrix (Welford) + dual-averaging step size during warmup,
- everything lax.while_loop/fori_loop + fixed shapes: one compiled program,
  thousands of vmapped chains per chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .base import BasePosteriorSampler


def _leapfrog(logdens_grad, z, r, eps, inv_mass):
    lp, grad = logdens_grad(z)

    def step(z, r, grad):
        r_half = r + 0.5 * eps * grad
        z_new = z + eps * inv_mass * r_half
        lp_new, grad_new = logdens_grad(z_new)
        r_new = r_half + 0.5 * eps * grad_new
        return z_new, r_new, lp_new, grad_new
    return step


def _kinetic(r, inv_mass):
    return 0.5 * jnp.sum(r * inv_mass * r)


def _is_turning(z_minus, r_minus, z_plus, r_plus, inv_mass):
    dz = z_plus - z_minus
    return (jnp.dot(dz, inv_mass * r_minus) < 0.) | (jnp.dot(dz, inv_mass * r_plus) < 0.)


def _popcount(x):
    # int32 population count, jit-safe
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def build_nuts_kernel(logdens_grad_fn, ndim, max_depth=10, max_delta_energy=1000.):
    """Returns step(key, z, lp, grad, eps, inv_mass) -> (z', lp', grad', stats)."""

    max_leaves = 2 ** max_depth

    def one_step(key, z0, lp0, grad0, eps, inv_mass):
        k_mom, k_build = jax.random.split(key)
        r0 = jax.random.normal(k_mom, (ndim,)) / jnp.sqrt(inv_mass)
        energy0 = -lp0 + _kinetic(r0, inv_mass)

        def leapfrog(z, r, grad):
            r_half = r + 0.5 * eps * grad
            z_new = z + eps * inv_mass * r_half

            def lg(zz):
                return logdens_grad_fn(zz)
            lp_new, grad_new = lg(z_new)
            r_new = r_half + 0.5 * eps * grad_new
            return z_new, r_new, lp_new, grad_new

        # trajectory state
        init = dict(
            key=k_build,
            z_minus=z0, r_minus=r0, grad_minus=grad0,
            z_plus=z0, r_plus=r0, grad_plus=grad0,
            z_prop=z0, lp_prop=lp0, grad_prop=grad0,
            logw_total=-energy0,          # multinomial weight of trajectory
            sum_accept=jnp.zeros(()), n_leaves=jnp.zeros((), jnp.int32),
            depth=jnp.zeros((), jnp.int32),
            turning=jnp.zeros((), jnp.bool_), diverging=jnp.zeros((), jnp.bool_),
        )

        def doubling_cond(s):
            return (s['depth'] < max_depth) & (~s['turning']) & (~s['diverging'])

        def doubling_body(s):
            key, k_dir, k_accept, k_sub = jax.random.split(s['key'], 4)
            go_right = jax.random.bernoulli(k_dir)
            n_sub = 2 ** s['depth']  # subtree leaf count this doubling (traced!)

            # subtree build: iterative loop over 2^depth leaves with checkpoints
            z_edge = jnp.where(go_right, s['z_plus'], s['z_minus'])
            r_edge = jnp.where(go_right, s['r_plus'], -s['r_minus'])
            grad_edge = jnp.where(go_right, s['grad_plus'], s['grad_minus'])

            ckpt_z = jnp.zeros((max_depth, ndim))
            ckpt_r = jnp.zeros((max_depth, ndim))

            sub = dict(
                z=z_edge, r=r_edge, grad=grad_edge,
                z_prop=z_edge, lp_prop=jnp.zeros(()), grad_prop=grad_edge,
                logw=-jnp.inf, sum_accept=jnp.zeros(()), n=jnp.zeros((), jnp.int32),
                turning=jnp.zeros((), jnp.bool_), diverging=jnp.zeros((), jnp.bool_),
                ckpt_z=ckpt_z, ckpt_r=ckpt_r, key=k_sub, i=jnp.zeros((), jnp.int32),
            )

            def sub_cond(t):
                return (t['i'] < n_sub) & (~t['turning']) & (~t['diverging'])

            def sub_body(t):
                i = t['i']
                z, r, lp, grad = leapfrog(t['z'], t['r'], t['grad'])
                # checkpoint storage: even leaf i stored POST-leapfrog at slot
                # popcount(i) (numpyro iterative scheme) so U-turn checks below
                # compare leaf i against the true left edge leaf i+1-2^k.
                slot = _popcount(i)
                store = (i % 2) == 0
                ckpt_z = jnp.where(store, t['ckpt_z'].at[slot].set(z), t['ckpt_z'])
                ckpt_r = jnp.where(store, t['ckpt_r'].at[slot].set(r), t['ckpt_r'])

                energy = -lp + _kinetic(r, inv_mass)
                delta = energy - energy0
                # NaN energies must terminate (and count as) divergences
                diverging = (delta > max_delta_energy) | jnp.isnan(delta)
                logw_leaf = jnp.where(jnp.isnan(delta), -jnp.inf, -energy)
                accept_prob = jnp.clip(jnp.exp(-delta), 0., 1.)
                accept_prob = jnp.where(jnp.isnan(accept_prob), 0., accept_prob)

                # progressive multinomial sampling within the subtree
                logw_new = jnp.logaddexp(t['logw'], logw_leaf)
                key, k_pick = jax.random.split(t['key'])
                p_take = jnp.exp(logw_leaf - logw_new)
                take = jax.random.uniform(k_pick) < p_take
                z_prop = jnp.where(take, z, t['z_prop'])
                lp_prop = jnp.where(take, lp, t['lp_prop'])
                grad_prop = jnp.where(take, grad, t['grad_prop'])

                # sub-tree U-turn checks: for every k>=1 with 2^k | (i+1),
                # check the left edge stored at slot popcount(i+1-2^k)
                ip1 = i + 1

                def check_k(k, turning):
                    size = 2 ** k
                    applies = (ip1 % size) == 0
                    j = ip1 - size
                    slot_j = _popcount(j)
                    zl = ckpt_z[slot_j]
                    rl = ckpt_r[slot_j]
                    turn = _is_turning(zl, rl, z, r, inv_mass)
                    return turning | (applies & (k >= 1) & turn)

                turning = lax.fori_loop(1, max_depth + 1, check_k, t['turning'])

                return dict(
                    z=z, r=r, grad=grad,
                    z_prop=z_prop, lp_prop=lp_prop, grad_prop=grad_prop,
                    logw=logw_new, sum_accept=t['sum_accept'] + accept_prob,
                    n=t['n'] + 1, turning=turning, diverging=t['diverging'] | diverging,
                    ckpt_z=ckpt_z, ckpt_r=ckpt_r, key=key, i=i + 1,
                )

            sub = lax.while_loop(sub_cond, sub_body, sub)

            # merge subtree into trajectory
            ok = (~sub['turning']) & (~sub['diverging'])
            z_new, r_new, grad_new = sub['z'], sub['r'], sub['grad']
            z_plus = jnp.where(go_right & ok, z_new, s['z_plus'])
            r_plus = jnp.where(go_right & ok, r_new, s['r_plus'])
            grad_plus = jnp.where(go_right & ok, grad_new, s['grad_plus'])
            z_minus = jnp.where((~go_right) & ok, z_new, s['z_minus'])
            r_minus = jnp.where((~go_right) & ok, -r_new, s['r_minus'])
            grad_minus = jnp.where((~go_right) & ok, grad_new, s['grad_minus'])

            # biased progressive sampling across the doubling
            p_new = jnp.exp(jnp.minimum(0., sub['logw'] - s['logw_total']))
            take = ok & (jax.random.uniform(k_accept) < p_new)
            z_prop = jnp.where(take, sub['z_prop'], s['z_prop'])
            lp_prop = jnp.where(take, sub['lp_prop'], s['lp_prop'])
            grad_prop = jnp.where(take, sub['grad_prop'], s['grad_prop'])
            logw_total = jnp.logaddexp(s['logw_total'], jnp.where(ok, sub['logw'], -jnp.inf))

            turning_ends = _is_turning(z_minus, r_minus, z_plus, r_plus, inv_mass)

            return dict(
                key=key,
                z_minus=z_minus, r_minus=r_minus, grad_minus=grad_minus,
                z_plus=z_plus, r_plus=r_plus, grad_plus=grad_plus,
                z_prop=z_prop, lp_prop=lp_prop, grad_prop=grad_prop,
                logw_total=logw_total,
                sum_accept=s['sum_accept'] + sub['sum_accept'],
                n_leaves=s['n_leaves'] + sub['n'],
                depth=s['depth'] + 1,
                turning=sub['turning'] | turning_ends, diverging=s['diverging'] | sub['diverging'],
            )

        out = lax.while_loop(doubling_cond, doubling_body, init)
        accept_stat = out['sum_accept'] / jnp.maximum(out['n_leaves'], 1)
        stats = dict(accept_stat=accept_stat, depth=out['depth'],
                     diverging=out['diverging'], n_leaves=out['n_leaves'])
        return out['z_prop'], out['lp_prop'], out['grad_prop'], stats

    return one_step


class NUTSSampler(BasePosteriorSampler):
    """Vmapped NUTS with Stan-style warmup (dual-averaging step size +
    diagonal Welford mass matrix).

    Bounded parameters are handled with a logit transform (gradients stay
    finite at the prior edges); the log-Jacobian is added to the density.
    """

    def __init__(self, likelihood, nchains=8, max_depth=8, target_accept=0.8,
                 pool_adaptation=None, trajectory=None, **kwargs):
        super().__init__(likelihood, **kwargs)
        self.nchains = int(nchains)
        self.max_depth = int(max_depth)
        self.target_accept = float(target_accept)
        # pool warmup adaptation across chains by default in the many-chain regime
        self.pool_adaptation = (self.nchains >= 32) if pool_adaptation is None else bool(pool_adaptation)
        # The vmapped tree is lockstep: every chain waits for the deepest
        # tree in the batch, an ~8x gradient-throughput tax at >=1024 chains.
        # trajectory='jitter' keeps the NUTS warmup (tree-based adaptation of
        # eps/mass) but samples with DENSE fixed-budget HMC at the
        # warmup-measured mean path length, halton-jittered and shared across
        # the batch — the default in the many-chain regime.
        if trajectory is None:
            trajectory = 'jitter' if self.nchains >= 1024 else 'nuts'
        if trajectory not in ('nuts', 'jitter'):
            raise ValueError("trajectory must be 'nuts' or 'jitter'")
        self.trajectory = trajectory
        self._set_transform()

    # --- bounded-parameter transform ---

    def _set_transform(self):
        los, his = [], []
        for p in self.varied_params:
            lims = p.prior.limits if p.prior is not None else (-np.inf, np.inf)
            los.append(lims[0])
            his.append(lims[1])
        self._lo = np.array(los)
        self._hi = np.array(his)
        self._bounded = np.isfinite(self._lo) & np.isfinite(self._hi)

    def _constrain(self, u):
        """unconstrained -> constrained + log|Jacobian|."""
        lo = jnp.asarray(self._lo)
        hi = jnp.asarray(self._hi)
        bounded = jnp.asarray(self._bounded)
        sig = jax.nn.sigmoid(u)
        x = jnp.where(bounded, lo + (hi - lo) * sig, u)
        logjac = jnp.sum(jnp.where(bounded, jnp.log(hi - lo) + jnp.log(sig) + jnp.log1p(-sig), 0.))
        return x, logjac

    def _unconstrain(self, x):
        lo = self._lo
        hi = self._hi
        t = np.clip((np.asarray(x) - lo) / np.where(self._bounded, hi - lo, 1.), 1e-6, 1 - 1e-6)
        return np.where(self._bounded, np.log(t) - np.log1p(-t), np.asarray(x))

    def _logdens_grad(self):
        def logdens(u):
            x, logjac = self._constrain(u)
            lp, _ = self.logpost_flat(x)
            return lp + logjac
        return jax.value_and_grad(logdens)

    def _make_kernel(self, lg):
        return build_nuts_kernel(lg, self.ndim, max_depth=self.max_depth)

    def _jitter_sample(self, lg, u, lp, grad, eps, inv_mass, L_ref, nsteps):
        """Dense fixed-budget sampling phase for trajectory='jitter': every
        chain takes the SAME halton-jittered number of leapfrog steps per
        iteration (mean = the warmup-measured NUTS path length), so the
        vmapped batch never waits for a deepest tree. Returns time-major
        records like lax.scan."""
        ndim, nchains = self.ndim, self.nchains
        max_steps = int(np.clip(4 * L_ref, 4, 2 ** self.max_depth))
        # Recording tax (ADVICE r3): re-evaluating the pipeline at the
        # accepted point just to fill the record is one extra whole-pipeline
        # eval per iteration. When aux holds nothing beyond loglike/logprior,
        # reconstruct instead: lp_x = lp_u - log|Jacobian| (static transform),
        # logprior is an elementwise prior sum, loglike = lp_x - logprior.
        aux_spec = jax.eval_shape(self.logpost_flat, jnp.zeros(ndim))[1]
        cheap_aux = set(aux_spec) <= {'loglikelihood', 'logprior'}
        pipe, names = self.pipeline, self.names

        def halton(i, base=2):
            f, r, ii = 1., 0., i
            for _ in range(20):
                f = f / base
                r = r + f * (ii % base)
                ii = ii // base
            return max(r, 1e-3)

        hs = jnp.asarray(np.array([halton(i + 1) for i in range(nsteps)]))
        keys = jax.random.split(self._next_key(), nsteps)

        def leapfrog_chain(u, grad, r, eps_c, nsteps_t, inv_mass_c):
            def body(s):
                u, grad, r, i = s
                r_half = r + 0.5 * eps_c * grad
                u_new = u + eps_c * inv_mass_c * r_half
                _, grad_new = lg(u_new)
                return (u_new, grad_new, r_half + 0.5 * eps_c * grad_new, i + 1)

            u, grad, r, _ = lax.while_loop(lambda s: s[3] < nsteps_t, body,
                                           (u, grad, r, jnp.zeros((), jnp.int32)))
            lp, grad = lg(u)
            return u, lp, grad, r

        def run_all(u, lp, grad, eps_b, inv_b, keys, hs):
            def body(carry, inp):
                u, lp, grad = carry
                key, h = inp
                nsteps_t = jnp.clip(jnp.ceil(2. * L_ref * h), 1, max_steps).astype(jnp.int32)
                kr, ka = jax.random.split(key)
                r0 = jax.random.normal(kr, (nchains, ndim)) / jnp.sqrt(inv_b)
                u1, lp1, grad1, r1 = jax.vmap(
                    lambda uu, gg, rr, ee, mm: leapfrog_chain(uu, gg, rr, ee, nsteps_t, mm))(
                        u, grad, r0, eps_b, inv_b)
                e0 = -lp + 0.5 * jnp.sum(inv_b * r0 ** 2, axis=1)
                e1 = -lp1 + 0.5 * jnp.sum(inv_b * r1 ** 2, axis=1)
                delta = e0 - e1
                delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
                accept = jnp.log(jax.random.uniform(ka, (nchains,))) < delta
                u_n = jnp.where(accept[:, None], u1, u)
                lp_n = jnp.where(accept, lp1, lp)
                grad_n = jnp.where(accept[:, None], grad1, grad)
                x, logjac_n = jax.vmap(self._constrain)(u_n)
                if cheap_aux:
                    lp_x = lp_n - logjac_n
                    aux = {}
                    if 'logprior' in aux_spec or 'loglikelihood' in aux_spec:
                        logprior = jax.vmap(
                            lambda xx: pipe.logprior(dict(zip(names, xx))))(x)
                        if 'logprior' in aux_spec:
                            aux['logprior'] = logprior
                        if 'loglikelihood' in aux_spec:
                            aux['loglikelihood'] = lp_x - logprior
                else:
                    lp_x, aux = jax.vmap(self.logpost_flat)(x)
                record = {'x': x, 'logposterior': lp_x,
                          'divergence': delta < -1000., **aux}
                return (u_n, lp_n, grad_n), record

            return lax.scan(body, (u, lp, grad), (keys, hs))

        runner = self._cached_jit(('nuts-jitter', nsteps, round(float(L_ref), 6), max_steps),
                                  lambda: jax.jit(run_all))
        eps_b = jnp.broadcast_to(eps, (nchains,))
        inv_b = jnp.broadcast_to(inv_mass, (nchains, ndim))
        return runner(u, lp, grad, eps_b, inv_b, keys, hs)

    def run(self, nsteps=1000, nwarmup=None, thin=1, resume=False):
        if nwarmup is None:
            nwarmup = max(200, nsteps // 2)
        ndim = self.ndim
        lg = self._logdens_grad()
        kernel = self._make_kernel(lg)
        target = self.target_accept
        resume = resume and getattr(self, '_state', None) is not None

        if not resume:
            x0, _ = self.get_start(self.nchains)
            u0 = jnp.asarray(np.array([self._unconstrain(np.asarray(x)) for x in x0]))

            # Fisher-diagonal mass guess from the autodiff hessian at ONE start
            # point, computed outside the traced sampling program (an in-trace
            # per-chain hessian blows up compile time): with tight reference
            # starts and short warmups the Welford estimate alone underestimates
            # the posterior scales (chains under-step); the curvature fixes the
            # scale immediately and Welford refines it.
            from ..config import host_eval
            with host_eval():
                u_med = jnp.median(u0, axis=0)
                hdiag = jnp.diagonal(jax.hessian(lambda uu: lg(uu)[0])(u_med))
                mass0 = jnp.clip(jnp.where(hdiag < -1e-12, -1. / hdiag, 1.), 1e-12, 1e12)
            mass0 = jnp.asarray(np.asarray(mass0))

        def warmup_chain(u, key):
            lp, grad = lg(u)

            def da_scan(u, lp, grad, inv_mass, eps0, n, key, collect_from):
                """Dual-averaging scan; also accumulates Welford variance from
                step ``collect_from`` on."""
                mu = jnp.log(10. * eps0)
                da0 = dict(log_eps=jnp.log(eps0), log_eps_bar=jnp.log(eps0), h_bar=jnp.zeros(()))
                welford0 = dict(mean=jnp.zeros(ndim), m2=jnp.zeros(ndim), count=jnp.zeros(()))

                def body(carry, inp):
                    u, lp, grad, da, welford, nl_sum = carry
                    i, key = inp
                    eps = jnp.exp(da['log_eps'])
                    u, lp, grad, stats = kernel(key, u, lp, grad, eps, inv_mass)
                    t = i + 1.
                    h_bar = (1. - 1. / (t + 10.)) * da['h_bar'] + (target - stats['accept_stat']) / (t + 10.)
                    log_eps = mu - jnp.sqrt(t) / 0.05 * h_bar
                    w = t ** -0.75
                    log_eps_bar = w * log_eps + (1. - w) * da['log_eps_bar']
                    da_new = dict(log_eps=log_eps, log_eps_bar=log_eps_bar, h_bar=h_bar)
                    in_window = i >= collect_from
                    cnt = welford['count'] + jnp.where(in_window, 1., 0.)
                    delta = u - welford['mean']
                    mean = welford['mean'] + jnp.where(in_window, delta / jnp.maximum(cnt, 1.), 0.)
                    m2 = welford['m2'] + jnp.where(in_window, delta * (u - mean), 0.)
                    nl_sum = nl_sum + stats['n_leaves']
                    return (u, lp, grad, da_new, dict(mean=mean, m2=m2, count=cnt), nl_sum), None

                keys = jax.random.split(key, n)
                idx = jnp.arange(n, dtype=jnp.float32)
                (u, lp, grad, da, welford, nl_sum), _ = lax.scan(
                    body, (u, lp, grad, da0, welford0, jnp.zeros(())), (idx, keys))
                eps = jnp.exp(da['log_eps_bar'])
                var = welford['m2'] / jnp.maximum(welford['count'] - 1., 1.)
                return u, lp, grad, eps, var, welford['count'], nl_sum / n

            k1, k2 = jax.random.split(key)
            nw1 = nwarmup // 2
            nw2 = nwarmup - nw1
            # phase 1: adapt eps under the (shared, precomputed) curvature
            # mass guess, collect variance
            u, lp, grad, eps1, var, cnt, _ = da_scan(u, lp, grad, mass0, 0.1, nw1, k1, nw1 // 3)
            inv_mass = jnp.where(cnt > 10, jnp.maximum(var, 1e-10), mass0)
            # phase 2: re-adapt eps under the learned mass; the mean tree
            # leapfrog count here sets trajectory='jitter' path lengths
            u, lp, grad, eps, _, _, nleap = da_scan(u, lp, grad, inv_mass, eps1, nw2, k2, nw2 + 1)
            return u, lp, grad, eps, inv_mass, nleap

        def sample_chain(u, lp, grad, eps, inv_mass, key):
            def body(carry, key):
                u, lp, grad = carry
                u, lp, grad, stats = kernel(key, u, lp, grad, eps, inv_mass)
                x, _ = self._constrain(u)
                lp_x, aux = self.logpost_flat(x)
                record = {'x': x, 'logposterior': lp_x,
                          'divergence': stats['diverging'], **aux}
                return (u, lp, grad), record

            keys = jax.random.split(key, nsteps)
            carry, records = lax.scan(body, (u, lp, grad), keys)
            return carry, records

        k_all = jax.random.split(self._next_key(), 2 * self.nchains)
        kw, ks = k_all[:self.nchains], k_all[self.nchains:]

        if resume:
            u, lp, grad, eps, inv_mass = self._state[:5]
            nleap = self._state[5] if len(self._state) > 5 else jnp.full((self.nchains,), 8.)
        else:
            u0, kw = self._shard_chains(u0, kw)
            warm = jax.jit(jax.vmap(warmup_chain))
            u, lp, grad, eps, inv_mass, nleap = warm(u0, kw)
            jax.block_until_ready(eps)
            if self.pool_adaptation:
                # cross-chain pooling: with many chains the per-chain dual
                # averaging occasionally leaves outliers with a degenerate step
                # size (frozen chains -> inflated Gelman-Rubin); the median step
                # size and mean mass matrix are far more robust and also reduce
                # tree-depth divergence across the vmapped lockstep batch.
                eps = jnp.full_like(eps, jnp.median(eps))
                inv_mass = jnp.broadcast_to(jnp.mean(inv_mass, axis=0), inv_mass.shape)
        self.diagnostics['step_size'] = np.asarray(eps)

        if self.trajectory == 'jitter':
            L_ref = float(np.median(np.asarray(nleap)))
            self.diagnostics['jitter_path_length'] = L_ref
            u, lp, grad, eps, inv_mass = self._shard_chains(u, lp, grad, eps, inv_mass)
            (u_f, lp_f, grad_f), records = self._jitter_sample(
                lg, u, lp, grad, eps, inv_mass, L_ref, nsteps)
            self._state = (u_f, lp_f, grad_f, eps, inv_mass, nleap)
            jax.block_until_ready(records['logposterior'])
            if self.mesh is not None:
                self._mesh_gelman_rubin(records['x'])
            div = records.pop('divergence')
            self.diagnostics['divergence_rate'] = float(jnp.mean(div))
            x = records.pop('x')
            sl = slice(None, None, thin)
            return self._make_chain(x[sl], {k: v[sl] for k, v in records.items()},
                                    attrs={'sampler': 'nuts-jitter',
                                           'path_length_leapfrogs': L_ref})

        u, lp, grad, eps, inv_mass, ks = self._shard_chains(u, lp, grad, eps, inv_mass, ks)
        sample = self._cached_jit(('nuts-sample', nsteps),
                                  lambda: jax.jit(jax.vmap(sample_chain)))
        (u_f, lp_f, grad_f), records = sample(u, lp, grad, eps, inv_mass, ks)
        self._state = (u_f, lp_f, grad_f, eps, inv_mass, nleap)
        records = jax.tree.map(lambda v: jnp.moveaxis(v, 0, 1), records)
        jax.block_until_ready(records['logposterior'])
        if self.mesh is not None:
            self._mesh_gelman_rubin(records['x'])
        div = records.pop('divergence')
        self.diagnostics['divergence_rate'] = float(jnp.mean(div))
        x = records.pop('x')
        sl = slice(None, None, thin)
        return self._make_chain(x[sl], {k: v[sl] for k, v in records.items()},
                                attrs={'sampler': 'nuts', 'step_size': list(np.asarray(eps)),
                                       'divergence_rate': self.diagnostics['divergence_rate']})
