"""Emulated Boltzmann engine: Boltzmann-quality linear pk without a host code.

Fills the gap the reference covers with CLASS via cosmoprimo
(theories/primordial_cosmology.py:78) and SURVEY.md §2.10 row 1 prescribes
for TPU: an MLP over the cosmological parameters, trained on high-accuracy
tables, serving sub-0.1% linear pk, rs_drag — differentiable end to end.

Design
------
The network does NOT predict the raw spectrum. It predicts the smooth,
small-dynamic-range CORRECTION to the in-framework EH98 backend:

    ln r(k, z; p) = ln [ P_truth(k, z; p) / P_eh98(k, z; p) ]     (nz, nk grid)
    ln s(p)       = ln [ rs_truth(p) / rs_eh98(p) ]               (scalar)

so at inference  pk_dd = pk_eh98 * exp(r)  and  rs_drag = rs_eh98 * s.
The EH98 factor carries the dynamic range (5 orders of magnitude in pk, the
full growth and primordial-tilt response); the MLP only corrects the few-%
transfer-function error, which is why a small network reaches 1e-3 accuracy
over the full prior box. Everything stays differentiable: EH98/background
are pure JAX, the MLP forward is three matmuls.

Workflow (production)
---------------------
1. ``sobol_grid`` + ``write_grid_spec`` -> grid spec archive;
2. a CLASS-equipped host runs ``scripts/generate_boltzmann_tables.py`` on
   the spec -> tables archive (this repo has no network/Boltzmann code);
3. ``train_pk_emulator`` on the tables -> weights archive;
4. ``Cosmology(engine='emulator', emulator='weights.npz')``.

What the suite establishes (and what it cannot)
-----------------------------------------------
``tests/test_boltzmann_emulator.py`` exercises the identical loop against
two synthetic truths: (a) the EH99 neutrino suppression — a realistic
smooth few-% correction — reaching <5e-4 held-out pk error; and (b) a
wiggle-bearing truth whose sound horizon is shifted by a parameter-
dependent ~1.5% so the ln-ratio oscillates through the BAO band with
parameter-dependent phase (the hardest feature of a real CLASS/EH98
ratio), reaching <1.5e-3 held-out error at the PRODUCTION default k-grid
density. That validates the pipeline, the k-grid/node choices, and the
network capacity on both the smooth and the oscillatory regime — but a
literal "sub-0.1% vs CLASS" statement can only be certified by training
on CLASS tables from a Boltzmann-equipped host (step 2 below) and reading
``weights['holdout_err']``.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp

from . import background as bg
from . import linear as lin


DEFAULT_PARAM_NAMES = ('h', 'omega_cdm', 'omega_b', 'logA', 'n_s', 'm_ncdm')

DEFAULT_RANGES = {
    # generous DESI-like prior box (see theories/cosmology.py defaults)
    'h': (0.55, 0.80), 'omega_cdm': (0.08, 0.16), 'omega_b': (0.019, 0.026),
    'logA': (2.6, 3.4), 'n_s': (0.88, 1.05), 'm_ncdm': (0.0, 0.6),
}


# --------------------------------------------------------------------------
# training-grid spec

def sobol_grid(ranges=None, n=1024, seed=11):
    """Sobol points over the parameter box. Returns (names, X (n, ndim))."""
    from scipy.stats import qmc
    ranges = dict(DEFAULT_RANGES if ranges is None else ranges)
    names = tuple(ranges)
    lo = np.array([ranges[k][0] for k in names])
    hi = np.array([ranges[k][1] for k in names])
    u = qmc.Sobol(len(names), seed=seed).random(int(n))
    return names, lo + (hi - lo) * u


def write_grid_spec(filename, names=None, X=None, k_grid=None, z_grid=None, **sobol_kwargs):
    """Write the training-grid spec a Boltzmann host consumes
    (scripts/generate_boltzmann_tables.py)."""
    if X is None:
        names, X = sobol_grid(**sobol_kwargs)
    k_grid = np.geomspace(1e-4, 10., 256) if k_grid is None else np.asarray(k_grid, dtype='f8')
    z_grid = np.linspace(0., 3., 7) if z_grid is None else np.asarray(z_grid, dtype='f8')
    np.savez(str(filename), meta=np.array(json.dumps({'param_names': list(names)})),
             X=np.asarray(X, dtype='f8'), k_grid=k_grid, z_grid=z_grid)
    return dict(param_names=tuple(names), X=np.asarray(X), k_grid=k_grid, z_grid=z_grid)


# --------------------------------------------------------------------------
# target construction + training

def _resolve_point(names, theta):
    return bg.resolve({name: float(v) for name, v in zip(names, theta)})


def make_targets(names, X, pk_tables, rs_drags, k_grid, z_grid):
    """ln-ratio targets vs the EH98 backend at the same parameters.

    pk_tables: (n, nz, nk) truth P(k, z) [(Mpc/h)^3]; rs_drags: (n,) [Mpc/h].
    Returns Y (n, nz*nk + 1) float64.
    """
    X = np.asarray(X, dtype='f8')
    pk_tables = np.asarray(pk_tables, dtype='f8')
    rs_drags = np.asarray(rs_drags, dtype='f8')
    k = jnp.asarray(np.asarray(k_grid, dtype='f8'))

    @jax.jit
    def eh98_row(theta):
        p = bg.resolve({name: t for name, t in zip(names, theta)})
        pk = jnp.stack([lin.pk_lin(p, k, float(z)) for z in np.asarray(z_grid)])
        return pk, bg.rs_drag(p)

    rows = []
    for i in range(X.shape[0]):
        pk_eh, rs_eh = eh98_row(jnp.asarray(X[i]))
        lnr = np.log(pk_tables[i] / np.asarray(pk_eh))
        rows.append(np.concatenate([lnr.reshape(-1), [np.log(rs_drags[i] / float(rs_eh))]]))
    return np.asarray(rows)


def train_mlp(names, X, Y, hidden=(128, 128), nsteps=8000, learning_rate=3e-3,
              seed=3, holdout=0.1):
    """Generic full-batch MLP regression X -> Y with per-output
    normalization. Returns a weights dict (see predict_raw for the layout)
    plus '_holdout_idx' (indices of the held-out rows, for task-specific
    error metrics). Shared by the pk engine and the emulated-Cl engine
    (likelihoods/cmb)."""
    import optax

    X = np.asarray(X, dtype='f8')
    Y = np.asarray(Y, dtype='f8')
    n = X.shape[0]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    nho = max(1, int(holdout * n))
    idx_tr, idx_ho = perm[nho:], perm[:nho]

    xm, xs = X[idx_tr].mean(0), X[idx_tr].std(0) + 1e-30
    ym, ys = Y[idx_tr].mean(0), Y[idx_tr].std(0) + 1e-12
    Xt = jnp.asarray((X[idx_tr] - xm) / xs, dtype=jnp.float32)
    Yt = jnp.asarray((Y[idx_tr] - ym) / ys, dtype=jnp.float32)

    sizes = (X.shape[1],) + tuple(hidden) + (Y.shape[1],)
    key = jax.random.key(seed)
    layers = []
    for fan_in, fan_out in zip(sizes[:-1], sizes[1:]):
        key, sub = jax.random.split(key)
        W = jax.random.normal(sub, (fan_in, fan_out), dtype=jnp.float32) / np.sqrt(fan_in)
        layers.append((W, jnp.zeros((fan_out,), dtype=jnp.float32)))

    sched = optax.cosine_decay_schedule(learning_rate, nsteps)
    opt = optax.adam(sched)
    state = opt.init(layers)

    @jax.jit
    def step(layers, state):
        def loss(ls):
            return jnp.mean((_forward(ls, Xt) - Yt) ** 2)
        l, g = jax.value_and_grad(loss)(layers)
        updates, state_ = opt.update(g, state, layers)
        return optax.apply_updates(layers, updates), state_, l

    for _ in range(int(nsteps)):
        layers, state, l = step(layers, state)

    return {'param_names': tuple(names),
            'x_mean': np.asarray(xm), 'x_std': np.asarray(xs),
            'y_mean': np.asarray(ym), 'y_std': np.asarray(ys),
            'layers': [(np.asarray(W), np.asarray(b)) for W, b in layers],
            'loss': float(l), '_holdout_idx': idx_ho}


def train_pk_emulator(names, X, Y, k_grid, z_grid, hidden=(128, 128),
                      nsteps=8000, learning_rate=3e-3, seed=3, holdout=0.1):
    """Train the pk-correction MLP. Returns a weights dict including held-out
    max |pk ratio error| in 'holdout_err'."""
    weights = train_mlp(names, X, Y, hidden=hidden, nsteps=nsteps,
                        learning_rate=learning_rate, seed=seed, holdout=holdout)
    idx_ho = weights.pop('_holdout_idx')
    weights['k_grid'] = np.asarray(k_grid, dtype='f8')
    weights['z_grid'] = np.asarray(z_grid, dtype='f8')
    # held-out accuracy in pk-ratio space: |exp(pred - truth) - 1|
    pred = np.asarray(predict_raw(weights, jnp.asarray(np.asarray(X)[idx_ho])))
    err = np.abs(np.exp(pred - np.asarray(Y)[idx_ho]) - 1.)
    weights['holdout_err'] = float(err.max())
    return weights


def _forward(layers, x):
    for W, b in layers[:-1]:
        x = jax.nn.gelu(x @ W + b)
    W, b = layers[-1]
    return x @ W + b


def predict_raw(weights, theta):
    """theta (..., ndim) -> de-normalized outputs (..., nz*nk + 1), float64.
    Differentiable; the float32 network resolves the O(0.1) ln-ratios to
    ~1e-7, far below the 1e-3 accuracy target."""
    x = (jnp.asarray(theta) - jnp.asarray(weights['x_mean'])) / jnp.asarray(weights['x_std'])
    layers = [(jnp.asarray(W), jnp.asarray(b)) for W, b in weights['layers']]
    y = _forward(layers, x.astype(jnp.float32))
    out = y.astype(jnp.result_type(float)) * jnp.asarray(weights['y_std']) + jnp.asarray(weights['y_mean'])
    return out


def predict_tables(weights, theta):
    """theta (ndim,) -> (lnratio (nz, nk), rs_ratio scalar)."""
    out = predict_raw(weights, theta)
    nz, nk = len(weights['z_grid']), len(weights['k_grid'])
    return out[:nz * nk].reshape(nz, nk), jnp.exp(out[nz * nk])


# --------------------------------------------------------------------------
# IO

def save_weights(filename, weights):
    """Persist a weights dict: 'layers' is split into W%d/b%d arrays, other
    ndarray values saved verbatim, everything else (names, scalars, nested
    dicts of floats) goes into the json meta."""
    meta, arrays = {'nlayers': len(weights['layers'])}, {}
    for key, value in weights.items():
        if key == 'layers' or key.startswith('_'):
            continue
        if isinstance(value, np.ndarray):
            arrays[key] = value
        else:
            meta[key] = list(value) if isinstance(value, tuple) else value
    meta['_array_keys'] = sorted(arrays)
    arrays['meta'] = np.array(json.dumps(meta))
    for i, (W, b) in enumerate(weights['layers']):
        arrays['W%d' % i] = np.asarray(W)
        arrays['b%d' % i] = np.asarray(b)
    np.savez(str(filename), **arrays)


def load_weights(filename):
    loaded = np.load(str(filename), allow_pickle=False)
    meta = json.loads(str(loaded['meta']))
    array_keys = meta.pop('_array_keys')
    nlayers = meta.pop('nlayers')
    weights = {k: (tuple(v) if isinstance(v, list) else v) for k, v in meta.items()}
    for key in array_keys:
        weights[key] = loaded[key]
    weights['layers'] = [(loaded['W%d' % i], loaded['b%d' % i]) for i in range(nlayers)]
    return weights
