"""Emulators: Taylor expansion and MLP surrogates as drop-in graph nodes.

Counterpart of reference emulators/__init__.py:55 (Emulator), :430 (Taylor),
:510 (MLP). TPU-native differences: the Taylor engine takes exact nested-
jacfwd derivatives (no finite-difference grids, reference :438-462), and the
MLP is a flax module trained with optax on QMC draws — both predict() paths
are pure jit-safe functions, so an emulated node fuses into the compiled
pipeline like any other calculator.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import BaseClass, is_sequence
from ..parameters import ParameterCollection, Deriv
from ..core import Calculator, Pipeline


class Emulator(BaseClass):
    """Emulate the varied ``__getstate__`` outputs of a calculator as a
    function of its pipeline's varied parameters."""

    def __init__(self, calculator, engine='taylor', **engine_options):
        self.calculator = calculator
        self.pipeline = calculator.pipeline
        self.varied_params = ParameterCollection([p.clone() for p in self.pipeline.varied_params])
        self.names = self.varied_params.names()
        self.center = np.array([p.value for p in self.varied_params])
        if isinstance(engine, str):
            engine = {'taylor': TaylorEmulatorEngine, 'mlp': MLPEmulatorEngine,
                      'point': PointEmulatorEngine}[engine](**engine_options)
        self.engine = engine
        self._classify()

    def _classify(self, ntries=3, seed=42):
        """Split state entries into fixed vs varied (reference base.py:600)."""
        key = jax.random.key(seed)
        states = []
        for i in range(ntries):
            values = {}
            for p in self.varied_params:
                key, sub = jax.random.split(key)
                values[p.name] = float(np.asarray(p.sample_ref(sub)))
            self.pipeline.evaluate(values)
            states.append({k: np.asarray(v) for k, v in self.calculator.__getstate__().items()
                           if v is not None and np.issubdtype(np.asarray(v).dtype, np.number)})
        self.fixed_state = {}
        self.varied_names = []
        for k in states[0]:
            if all(np.array_equal(states[0][k], s[k]) for s in states[1:]):
                self.fixed_state[k] = states[0][k]
            else:
                self.varied_names.append(k)
        self.shapes = {k: states[0][k].shape for k in self.varied_names}
        # restore center evaluation
        self.pipeline.evaluate({p.name: p.value for p in self.varied_params})

    def _state_fn(self):
        pipe = self.pipeline
        calc = self.calculator
        names = self.names
        varied_names = self.varied_names

        def fn(theta):
            values = dict(zip(names, theta))
            full = pipe._resolve_values(values)
            pipe.run_once(full)
            state = calc.__getstate__()
            if not varied_names:
                return jnp.zeros((0,))
            return jnp.concatenate([jnp.asarray(state[k]).reshape(-1) for k in varied_names])
        return fn

    def set_samples(self, **kwargs):
        self.engine.set_samples(self, **kwargs)
        return self

    def fit(self, **kwargs):
        if not getattr(self.engine, '_samples_ready', False):
            self.set_samples()
        self.engine.fit(self, **kwargs)
        return self

    def predict(self, theta):
        """theta (ndim,) -> dict of varied state entries (jit-safe)."""
        flat = self.engine.predict(jnp.asarray(theta))
        out = {}
        start = 0
        for k in self.varied_names:
            size = int(np.prod(self.shapes[k], dtype='i8')) if self.shapes[k] else 1
            out[k] = flat[start:start + size].reshape(self.shapes[k])
            start += size
        return out

    def check(self, ntests=10, seed=123):
        """Max relative error of the emulator over random ref draws."""
        key = jax.random.key(seed)
        fn = self._state_fn()
        errs = []
        for _ in range(ntests):
            theta = []
            for p in self.varied_params:
                key, sub = jax.random.split(key)
                theta.append(float(np.asarray(p.sample_ref(sub))))
            theta = np.array(theta)
            truth = np.asarray(fn(jnp.asarray(theta)))
            pred = np.concatenate([np.asarray(v).reshape(-1) for v in self.predict(theta).values()])
            scale = np.maximum(np.abs(truth), np.max(np.abs(truth)) * 1e-3)
            errs.append(np.max(np.abs(pred - truth) / scale))
        return float(np.max(errs))

    def to_calculator(self):
        """Drop-in replacement node: same class surface, predicted state."""
        orig = self.calculator
        emu = self

        # shadow read-only properties (e.g. template qpar/qper) with plain
        # class attributes so predicted state can be assigned
        overrides = {}
        for name in list(self.varied_names) + list(self.fixed_state):
            if isinstance(getattr(orig.__class__, name, None), property):
                overrides[name] = None
        cls = type('Emulated' + orig.__class__.__name__, (EmulatedCalculator, orig.__class__), overrides)
        new = cls(params=[p.clone() for p in self.varied_params])
        # copy static attributes (tables, grids, methods' state)
        skip = {'init', 'runtime_info', 'params'}
        for k, v in orig.__dict__.items():
            if k not in skip and not isinstance(v, Calculator):
                new.__dict__[k] = v
        new._emulator = emu
        return new

    # --- IO ---

    def save(self, filename):
        """Persist the emulator (engine coefficients + state layout + params).
        Reload with ``Emulator.load(filename, calculator=...)`` passing an
        instance of the same (configured) calculator for the static surface."""
        import json
        meta = dict(engine_name=self.engine.name,
                    names=self.names,
                    varied_names=self.varied_names,
                    shapes={k: list(v) for k, v in self.shapes.items()},
                    params=self.varied_params.__getstate__())
        arrays = {'meta': np.array(json.dumps(meta, default=float))}
        for k, v in self.fixed_state.items():
            arrays['fixed:' + k] = np.asarray(v)
        for k, v in self.engine.__getstate__().items():
            arrays['engine:' + k] = np.asarray(v)
        np.savez(str(filename), **arrays)

    @classmethod
    def load(cls, filename, calculator):
        """Rebuild an emulator saved with :meth:`save`; ``calculator`` must be
        a (same-config) instance providing the static attribute surface."""
        import json
        from ..parameters import Parameter
        loaded = np.load(str(filename), allow_pickle=False)
        meta = json.loads(str(loaded['meta']))
        new = cls.__new__(cls)
        new.calculator = calculator
        calculator.runtime_info.initialize()
        new.pipeline = calculator.pipeline
        new.names = list(meta['names'])
        new.varied_names = list(meta['varied_names'])
        new.shapes = {k: tuple(v) for k, v in meta['shapes'].items()}
        new.varied_params = ParameterCollection([Parameter(**s) for s in meta['params']['params']])
        new.center = np.array([p.value for p in new.varied_params])
        new.fixed_state = {k[6:]: loaded[k] for k in loaded.files if k.startswith('fixed:')}
        engine_state = {k[7:]: loaded[k] for k in loaded.files if k.startswith('engine:')}
        engines = {'taylor': TaylorEmulatorEngine, 'point': PointEmulatorEngine, 'mlp': MLPEmulatorEngine}
        new.engine = engines[meta['engine_name']]()
        new.engine.__setstate__(engine_state, emulator=new)
        return new


class EmulatedCalculator(Calculator):
    """Mixin for emulated drop-in nodes (reference emulators/__init__.py:394)."""

    def initialize(self, **kwargs):
        pass

    def calculate(self, **params):
        emu = self._emulator
        theta = jnp.stack([jnp.asarray(params[p.basename]) for p in emu.varied_params])
        state = emu.predict(theta)
        for k, v in emu.fixed_state.items():
            setattr(self, k, v)
        for k, v in state.items():
            setattr(self, k, v)
        # invalidate any per-trace caches copied from the original
        if hasattr(self, '_cheb_cache'):
            self._cheb_cache = {}


class BaseEmulatorEngine(BaseClass):
    name = 'base'
    _samples_ready = False

    def __getstate__(self):
        return {}


class PointEmulatorEngine(BaseEmulatorEngine):
    """Constant state at the center point (reference :421)."""

    name = 'point'

    def set_samples(self, emulator):
        self._samples_ready = True

    def fit(self, emulator):
        fn = emulator._state_fn()
        self._value = jnp.asarray(fn(jnp.asarray(emulator.center)))

    def predict(self, theta):
        return self._value


class TaylorEmulatorEngine(BaseEmulatorEngine):
    """Taylor expansion from exact nested jacfwd derivatives (reference :430)."""

    name = 'taylor'

    def __init__(self, order=3, method='auto', accuracy=2, delta_scale=1.):
        """``method``/``accuracy``/``delta_scale`` configure the underlying
        :class:`Differentiation` (reference emulators/__init__.py:430 forwards
        the same keywords) — method='finite' fits the Taylor series from
        central differences for non-differentiable calculators."""
        self.order = int(order)
        self.method = str(method)
        self.accuracy = int(accuracy)
        self.delta_scale = float(delta_scale)

    def set_samples(self, emulator):
        self._samples_ready = True

    def fit(self, emulator):
        from ..differentiation import Differentiation
        calc = emulator.calculator

        def getter():
            state = calc.__getstate__()
            return jnp.concatenate([jnp.asarray(state[k]).reshape(-1) for k in emulator.varied_names])

        diff = Differentiation(calc, getter=getter, order=self.order,
                               method=getattr(self, 'method', 'auto'),
                               accuracy=getattr(self, 'accuracy', 2),
                               delta_scale=getattr(self, 'delta_scale', 1.))
        result = diff()['value']
        self.center = jnp.asarray(emulator.center)
        self.derivs = [dict(d) for d in result.derivs]
        self.coeffs = jnp.asarray(result.value)
        self.names = list(emulator.names)

    def predict(self, theta):
        delta = theta - self.center
        out = jnp.zeros(self.coeffs.shape[-1], dtype=theta.dtype)
        for i, d in enumerate(self.derivs):
            factor = 1.
            for name, count in d.items():
                j = self.names.index(name)
                factor = factor * delta[j] ** count / math.factorial(count)
            out = out + factor * self.coeffs[i]
        return out

    def __getstate__(self):
        return {'coeffs': np.asarray(self.coeffs), 'center': np.asarray(self.center),
                'derivs': np.array([repr(sorted(d.items())) for d in self.derivs])}

    def __setstate__(self, state, emulator=None):
        import ast
        self.coeffs = jnp.asarray(state['coeffs'])
        self.center = jnp.asarray(state['center'])
        self.derivs = [dict(ast.literal_eval(str(s))) for s in state['derivs']]
        self.names = list(emulator.names)


class MLPEmulatorEngine(BaseEmulatorEngine):
    """Flax MLP surrogate trained on QMC draws (reference :510)."""

    name = 'mlp'

    def __init__(self, hidden=(64, 64), nsamples=512, nsteps=3000, learning_rate=3e-3, seed=7):
        self.hidden = tuple(hidden)
        self.nsamples = int(nsamples)
        self.nsteps = int(nsteps)
        self.learning_rate = float(learning_rate)
        self.seed = int(seed)

    def set_samples(self, emulator, samples=None):
        """samples=None: QMC draws evaluated through the calculator.
        samples=X (n, ndim): user points, evaluated through the calculator.
        samples=(X, Y): EXTERNAL training pairs — e.g. pk tables computed
        offline by a Boltzmann code at parameter points X (the SURVEY §2.10
        'emulated linear pk trained from injected tables' path); Y rows must
        be the flattened varied state in ``emulator.varied_names`` order."""
        from scipy.stats import qmc
        if isinstance(samples, tuple) and len(samples) == 2:
            X, Y = samples
            self.X = np.asarray(X, dtype='f8')
            self.Y = np.asarray(Y, dtype='f8')
            if self.Y.shape[0] != self.X.shape[0]:
                raise ValueError('X and Y must have the same number of rows')
            self._samples_ready = True
            return
        if samples is None:
            d = len(emulator.names)
            u = qmc.Sobol(d, seed=self.seed).random(self.nsamples)
            pts = np.empty_like(u)
            for i, p in enumerate(emulator.varied_params):
                dist = p.ref if p.ref is not None else p.prior
                pts[:, i] = dist.ppf(u[:, i])
            samples = pts
        self.X = np.asarray(samples, dtype='f8')
        fn = jax.jit(emulator._state_fn())
        self.Y = np.array([np.asarray(fn(jnp.asarray(x))) for x in self.X])
        self._samples_ready = True

    def fit(self, emulator):
        import flax.linen as nn
        import optax

        xm, xs = self.X.mean(0), self.X.std(0) + 1e-30
        ym, ys = self.Y.mean(0), self.Y.std(0) + 1e-30
        self._norm = tuple(jnp.asarray(a, dtype=jnp.float32) for a in (xm, xs, ym, ys))

        hidden = self.hidden
        nout = self.Y.shape[1]

        class MLP(nn.Module):
            @nn.compact
            def __call__(self, x):
                for h in hidden:
                    x = nn.gelu(nn.Dense(h)(x))
                return nn.Dense(nout)(x)

        model = MLP()
        key = jax.random.key(self.seed)
        params = model.init(key, jnp.zeros((1, self.X.shape[1])))
        X = (jnp.asarray(self.X, dtype=jnp.float32) - self._norm[0]) / self._norm[1]
        Y = (jnp.asarray(self.Y, dtype=jnp.float32) - self._norm[2]) / self._norm[3]

        sched = optax.cosine_decay_schedule(self.learning_rate, self.nsteps)
        opt = optax.adam(sched)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            def loss(p):
                pred = model.apply(p, X)
                return jnp.mean((pred - Y) ** 2)
            l, g = jax.value_and_grad(loss)(params)
            updates, state = opt.update(g, state, params)
            return optax.apply_updates(params, updates), state, l

        for _ in range(self.nsteps):
            params, state, l = step(params, state)
        self._model = model
        self._params = params
        self.loss = float(l)

    def predict(self, theta):
        xm, xs, ym, ys = self._norm
        x = (theta.astype(jnp.float32) - xm) / xs
        y = self._model.apply(self._params, x[None, :])[0]
        return y * ys + ym

    def __getstate__(self):
        return {'loss': np.asarray(getattr(self, 'loss', np.nan))}
