"""Pipeline: topologically-ordered calculator graph compiled to one XLA program.

Counterpart of the reference's ``BasePipeline`` (base.py:387-572), with the
dirty-flag memoization replaced by whole-graph fusion: the per-evaluation
walk is a pure function ``values -> (result, derived)`` traced once and
compiled; XLA's CSE/fusion supersedes per-node recompute tracking
(SURVEY.md §7 design note).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import BaseClass, evaluate as safe_evaluate
from ..parameters import Parameter, ParameterCollection
from .calculator import Calculator


class Pipeline(BaseClass):
    """Builds and evaluates the calculator graph rooted at ``root``."""

    def __init__(self, root):
        self.root = root
        self.calculators = []

        def callback(calc):
            calc.runtime_info.initialize()
            if calc in self.calculators:
                # move to front (dependencies of multiple nodes)
                self.calculators.remove(calc)
            self.calculators.append(calc)
            for req in calc.runtime_info.requires:
                callback(req)

        from ..config import host_eval
        with host_eval():  # graph build is host-side work; never touch the TPU
            callback(root)
            self.calculators = self.calculators[::-1]  # dependencies first
            self._set_params()
        self._compiled = {}

    def _stale(self):
        return any((not c.runtime_info.initialized) or c.init._updated
                   for c in self.calculators)

    def _set_params(self):
        params = ParameterCollection()
        self._param_owners = {}
        for calc in self.calculators:
            for param in calc.runtime_info.params:
                if param.name in params:
                    existing = params[param.name]
                    # merge: prefer the declaration with an explicit prior,
                    # and a varied declaration over a fixed one (shared nodes)
                    if (existing.prior is None and param.prior is not None) or \
                            (existing.fixed and not param.fixed):
                        params.set(param)
                else:
                    params.set(param)
                self._param_owners.setdefault(param.name, []).append(calc)
        self.params = params

    # --- parameter views ---

    @property
    def varied_params(self):
        """Sampled parameters: varied, not solved, not derived-by-expression."""
        return ParameterCollection([p for p in self.params
                                    if p.varied and not p.solved and not p.depends])

    @property
    def solved_params(self):
        return ParameterCollection([p for p in self.params if p.solved])

    @property
    def derived_params(self):
        return ParameterCollection([p for p in self.params if p.derived is True])

    def input_defaults(self):
        """Default values for every input parameter (fixed + varied + solved)."""
        values = {}
        for p in self.params:
            if p.derived is True:
                continue
            values[p.name] = p.value
        return values

    # --- evaluation ---

    def _resolve_values(self, values):
        """Overlay user values on defaults; evaluate derived expressions."""
        full = self.input_defaults()
        for name, value in values.items():
            if name.startswith('external:'):
                # injected external-state arrays (host-cosmology products,
                # see external_values): traced through the compiled program
                # so new tables do NOT retrigger compilation
                full[name] = value
            elif name in full:
                full[name] = value
            else:
                # allow basename shortcut if unique
                matches = [p.name for p in self.params if p.basename == name]
                if len(matches) == 1:
                    full[matches[0]] = value
                elif len(matches) > 1:
                    raise ValueError('ambiguous parameter {}: {}'.format(name, matches))
                else:
                    raise ValueError('unknown parameter {}'.format(name))
        # derived expressions '{a}+{b}' (reference parameter.py:1872 eval)
        pending = [p for p in self.params if p.depends]
        for _ in range(len(pending) + 1):
            progress = False
            for p in list(pending):
                deps = {}
                ok = True
                for dep in p.depends:
                    key = dep if dep in full else None
                    if key is None:
                        matches = [q.name for q in self.params if q.basename == dep and q.name in full]
                        key = matches[0] if len(matches) == 1 else None
                    if key is None or any(q.name == key and q.depends for q in pending):
                        ok = False
                        break
                    deps[dep] = full[key]
                if ok:
                    expr = p.derived
                    locs = {}
                    for i, (dep, val) in enumerate(deps.items()):
                        var = '__dep{}__'.format(i)
                        expr = expr.replace('{' + dep + '}', var)
                        locs[var] = val
                    full[p.name] = safe_evaluate(expr, locals=locs)
                    pending.remove(p)
                    progress = True
            if not pending:
                break
            if not progress:
                raise ValueError('circular derived-parameter dependencies: {}'.format(
                    [p.name for p in pending]))
        return full

    def param_footprint(self, calc):
        """Input parameter names influencing ``calc`` directly or through its
        transitive dependencies — the reference's footprint notion
        (base.py:737 block_params)."""
        from .calculator import INIT_GENERATION
        if getattr(self, '_footprint_generation', None) != INIT_GENERATION[0]:
            self._footprint_memo = {}
            self._footprint_generation = INIT_GENERATION[0]
        memo = self._footprint_memo

        def walk(c):
            if id(c) not in memo:
                names = {p.name for p in c.runtime_info.params
                         if p.derived is not True and not p.drop}
                for req in c.runtime_info.requires:
                    names |= walk(req)
                memo[id(c)] = names
            return memo[id(c)]

        return walk(calc)

    def host_calculators(self):
        """Calculators flagged ``_host_eval`` (non-traceable host codes, e.g.
        DESY3Theory): run_once memoizes them on their parameter footprint, so
        nuisance-only moves never re-run the slow host code."""
        return [c for c in self.calculators if getattr(c, '_host_eval', False)]

    def block_params(self, oversample_power=0.4):
        """Split varied params into (fast, slow) blocks by whether their
        footprint touches a host-eval calculator, with a Cobaya-style
        oversampling factor for the fast block (reference base.py:737-857 /
        mcmc.py:408-424; under whole-graph jit only host nodes make
        blocking meaningful, SURVEY §2.11)."""
        hosts = self.host_calculators()
        slow_names = set()
        for host in hosts:
            slow_names |= self.param_footprint(host)
        fast, slow = [], []
        for p in self.varied_params:
            (slow if p.name in slow_names else fast).append(p.name)
        if not hosts or not fast or not slow:
            return [(self.varied_params.names(), 1)]
        # oversample fast moves by the measured speed ratio^power; the host
        # call dominates the slow block, so use a conservative proxy when
        # timings are unavailable (host calls are >= 10x a fused eval)
        factor = max(2, int(round(10 ** oversample_power * 2)))
        return [(slow, 1), (fast, factor)]

    _HOST_CACHE_SIZE = 4

    def _host_inputs(self, calc, full_values):
        """Concrete footprint inputs of a host node, or None if any is a
        tracer (then memoization is impossible and calculate must run)."""
        vals = []
        for n in sorted(self.param_footprint(calc)):
            v = full_values.get(n)
            if isinstance(v, jax.core.Tracer):
                return None
            vals.append(np.asarray(v))
        return vals

    def _host_lookup(self, calc, inputs):
        """Restore a cached output state for these inputs; True on hit. A
        small LRU (not just last-call memo) keeps Metropolis accept/reject
        ping-pong from re-running the host code."""
        cache = calc.__dict__.setdefault('_host_cache', [])
        for i, (key, state) in enumerate(cache):
            if len(key) == len(inputs) and all(np.array_equal(a, b) for a, b in zip(key, inputs)):
                for attr, value in state.items():
                    setattr(calc, attr, value)
                cache.insert(0, cache.pop(i))
                return True
        return False

    def _host_store(self, calc, inputs):
        state = {attr: getattr(calc, attr) for attr in getattr(calc, '_state_attrs', ())
                 if hasattr(calc, attr)}
        cache = calc.__dict__.setdefault('_host_cache', [])
        cache.insert(0, (inputs, state))
        del cache[self._HOST_CACHE_SIZE:]

    def run_once(self, full_values):
        """Pure per-evaluation walk. ``full_values``: every input param value.

        Returns (root_get, derived dict of full-name -> value).
        """
        restore = []
        for key, value in full_values.items():
            if key.startswith('external:'):
                _, idx, attr = key.split(':', 2)
                calc = self.calculators[int(idx)]
                restore.append((calc, attr, getattr(calc, attr)))
                setattr(calc, attr, value)
        try:
            for calc in self.calculators:
                cvals = {}
                for p in calc.runtime_info.params:
                    if p.derived is True or p.drop:
                        continue
                    cvals[p.basename] = full_values[p.name]
                if getattr(calc, '_host_eval', False):
                    inputs = self._host_inputs(calc, full_values)
                    if inputs is not None:
                        if self._host_lookup(calc, inputs):
                            continue
                        calc.calculate(**cvals)
                        self._host_store(calc, inputs)
                        continue
                calc.calculate(**cvals)
            derived = {}
            for calc in self.calculators:
                for p in calc.runtime_info.params:
                    if p.derived is True and hasattr(calc, p.basename):
                        derived[p.name] = getattr(calc, p.basename)
            return self.root.get(), derived
        finally:
            # external attrs hold host numpy state between evaluations; traced
            # values must not leak out of the transformed scope
            for calc, attr, original in restore:
                setattr(calc, attr, original)

    def evaluate(self, values=None):
        """Eager evaluation (debug/introspection/init path): attributes on
        the calculators are left as concrete arrays. Runs on the host CPU
        backend (remote-TPU eager dispatch is latency-bound)."""
        from ..config import host_eval
        with host_eval():
            full = self._resolve_values(values or {})
            full = {k: jnp.asarray(v) for k, v in full.items()}
            result, self.derived = self.run_once(full)
        return result

    def profile_speed(self, niterations=10):
        """Per-calculator wall time + fused-jit throughput (the reference's
        Monitor/_set_speed analog, base.py:695-735). Under whole-graph jit the
        per-calculator split is informational: parameter blocking is obsolete
        (SURVEY.md §2.11); this helps users find slow initialize-time nodes
        and compare eager vs compiled evaluation."""
        import time
        import jax
        # unique per-instance keys (multi-tracer graphs repeat class names)
        names = [c.runtime_info.name for c in self.calculators]
        counts = {n: names.count(n) for n in names}
        ordinal = {}
        keys = []
        for n in names:
            ordinal[n] = ordinal.get(n, 0) + 1
            keys.append('{}#{}'.format(n, ordinal[n]) if counts[n] > 1 else n)
        timings = {k: 0. for k in keys}
        values = self.input_defaults()
        full = {k: jnp.asarray(v) for k, v in values.items()}
        from ..config import host_eval
        with host_eval():
            for _ in range(max(1, niterations)):
                for key_i, calc in zip(keys, self.calculators):
                    cvals = {p.basename: full[p.name] for p in calc.runtime_info.params
                             if p.derived is not True and not p.drop}
                    t0 = time.perf_counter()
                    calc.calculate(**cvals)
                    # block on the produced state so eager timings measure
                    # compute, not async dispatch latency
                    state = getattr(calc, '__getstate__', None)
                    jax.block_until_ready(jax.tree.leaves(state() if state is not None else {}))
                    timings[key_i] += time.perf_counter() - t0
        eager = {name: t / max(1, niterations) for name, t in timings.items()}
        fn = self.get_fn()
        varied = {p.name: jnp.asarray(p.value) for p in self.varied_params}
        out = fn(varied)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        nrep = max(3, niterations)
        for _ in range(nrep):
            out = fn(varied)
        jax.block_until_ready(out)
        compiled = (time.perf_counter() - t0) / nrep
        return {'eager_per_calculator': eager, 'compiled_per_eval': compiled,
                'compiled_evals_per_sec': 1. / compiled if compiled > 0 else float('inf')}

    # --- external (host-cosmology) state injection ---

    def external_nodes(self):
        """Calculators carrying injectable external state (the
        host-Boltzmann shim; reference cosmo.py:37 / base.py:574-598)."""
        return [(i, c) for i, c in enumerate(self.calculators)
                if getattr(c, '_external_attrs', None)]

    def external_values(self):
        """Current external-state arrays keyed for the compiled program:
        merge into a values dict to evaluate at injected host products.
        Arrays are traced arguments — re-injection never retraces."""
        out = {}
        for i, calc in self.external_nodes():
            for attr in calc._external_attrs:
                out['external:{}:{}'.format(i, attr)] = np.asarray(getattr(calc, attr))
        return out

    def get_cosmo_requires(self):
        """Merged host-cosmology requirements declared by calculators
        (reference base.py:574: section -> quantity -> arguments)."""
        merged = {}
        for calc in self.calculators:
            for section, quantities in getattr(calc, 'cosmo_requires', {}).items():
                dest = merged.setdefault(section, {})
                for name, attrs in quantities.items():
                    dest[name] = attrs  # grids are node-defined; last wins
        return merged

    def set_cosmo_requires(self, **products):
        """Inject host-cosmology products into every external node
        (reference base.py:581). Follow with ``external_values()`` when
        evaluating through a compiled function."""
        for _, calc in self.external_nodes():
            calc.inject(**products)

    def logprior(self, values):
        """Sum of log priors of varied params at given (resolved) values."""
        logp = jnp.zeros(())
        for p in self.varied_params:
            if p.prior is not None:
                logp = logp + p.prior.logpdf(values[p.name])
        return logp

    # --- compiled entry points ---

    def get_fn(self):
        """Jitted pure fn: {varied name: value} -> root.get()."""
        if 'get' not in self._compiled:
            def fn(values):
                full = self._resolve_values(values)
                result, _ = self.run_once(full)
                return result
            self._compiled['get'] = jax.jit(fn)
        return self._compiled['get']

    def states_fn(self):
        """Jitted pure fn: values -> (root result, derived dict, states dict)."""
        if 'states' not in self._compiled:
            def fn(values):
                full = self._resolve_values(values)
                result, derived = self.run_once(full)
                states = {c.runtime_info.name + ':' + str(i): c.__getstate__()
                          for i, c in enumerate(self.calculators)}
                return result, derived, states
            self._compiled['states'] = jax.jit(fn)
        return self._compiled['states']
