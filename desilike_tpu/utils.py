"""Small host-side utilities (logging, dict helpers, safe expression evaluation).

Counterpart of the reference's ``desilike/utils.py`` (BaseClass, evaluate,
expand_dict, find_names) re-scoped for a functional JAX pipeline: anything
numeric and hot lives in :mod:`desilike_tpu.ops` instead.
"""

import fnmatch
import logging
import re
import sys

import numpy as np


def setup_logging(level='info', stream=sys.stdout):
    """Configure root logging; mirrors reference desilike.utils.setup_logging (utils.py:142)."""
    if isinstance(level, str):
        level = {'info': logging.INFO, 'debug': logging.DEBUG, 'warning': logging.WARNING,
                 'error': logging.ERROR}[level.lower()]
    fmt = logging.Formatter(fmt='[%(asctime)s %(name)-20s %(levelname)-8s] %(message)s',
                            datefmt='%m-%d %H:%M')
    handler = logging.StreamHandler(stream=stream)
    handler.setFormatter(fmt)
    root = logging.getLogger()
    root.handlers.clear()
    root.addHandler(handler)
    root.setLevel(level)


class BaseClass(object):
    """Mixin providing a class logger and shallow-copy helper."""

    @property
    def log(self):
        return logging.getLogger(self.__class__.__name__)

    def copy(self, **kwargs):
        import copy
        new = copy.copy(self)
        new.__dict__.update(kwargs)
        return new

    def deepcopy(self):
        import copy
        return copy.deepcopy(self)


def is_sequence(item):
    """True for list/tuple (not str/array)."""
    return isinstance(item, (list, tuple))


def find_names(allnames, name, quiet=True):
    """Match ``name`` (with * wildcards, or re.Pattern) against list of names.

    Mirrors reference parameter.py:135–197 behavior: returns matching names
    in input order.
    """
    if is_sequence(name):
        toret = []
        for nn in name:
            toret += find_names(allnames, nn, quiet=quiet)
        return toret
    if isinstance(name, re.Pattern):
        return [nn for nn in allnames if name.fullmatch(nn)]
    pattern = fnmatch.translate(str(name))
    toret = [nn for nn in allnames if re.fullmatch(pattern, nn)]
    if not toret and not quiet and '*' not in str(name):
        raise ValueError('{} not found in {}'.format(name, allnames))
    return toret


def expand_dict(di, names):
    """Expand wildcard keys of ``di`` against ``names``.

    >>> expand_dict({'a*': 1}, ['a1', 'a2'])
    {'a1': 1, 'a2': 1}
    """
    toret = {name: None for name in names}
    if not hasattr(di, 'items'):
        di = {'*': di}
    for template, value in di.items():
        for name in find_names(names, template):
            toret[name] = value
    return toret


_EVAL_LOCALS_CACHE = None


def _eval_locals():
    global _EVAL_LOCALS_CACHE
    if _EVAL_LOCALS_CACHE is None:
        import jax.numpy as jnp
        import scipy as sp
        _EVAL_LOCALS_CACHE = {'np': np, 'sp': sp, 'jnp': jnp}
    return _EVAL_LOCALS_CACHE


def evaluate(value, type=None, locals=None):
    """Evaluate a python expression with np/sp/jnp in scope.

    Used for derived-parameter expressions ('{a} + {b}') after placeholder
    substitution; mirrors reference utils.evaluate (utils.py:71).
    """
    gl = dict(_eval_locals())
    gl.update(locals or {})
    toret = eval(value, {'__builtins__': {'abs': abs, 'min': min, 'max': max}}, gl)
    if type is not None:
        toret = type(toret)
    return toret


def marching_squares(x, y, z, level):
    """All level-set polylines of ``z`` on a rectilinear grid — the numeric
    contour extractor used by the profilers (no matplotlib in the numeric
    path; reference counterpart profilers/base.py:656 contour tracing).

    Parameters
    ----------
    x : (nx,) grid along the first axis of z
    y : (ny,) grid along the second axis of z
    z : (nx, ny) field, z[i, j] = f(x[i], y[j])
    level : float

    Returns
    -------
    list of (npts, 2) float arrays — every disjoint polyline (closed loops
    repeat their first point at the end). Linear interpolation along cell
    edges; saddle cells are disambiguated by the cell-center average.
    """
    x = np.asarray(x, dtype='f8')
    y = np.asarray(y, dtype='f8')
    z = np.asarray(z, dtype='f8')
    nx, ny = z.shape
    above = z > level

    def edge_point(kind, i, j):
        # ('h', i, j): edge (x[i], y[j]) - (x[i+1], y[j]);
        # ('v', i, j): edge (x[i], y[j]) - (x[i], y[j+1])
        if kind == 'h':
            z0, z1 = z[i, j], z[i + 1, j]
            t = (level - z0) / (z1 - z0)
            return (x[i] + t * (x[i + 1] - x[i]), y[j])
        z0, z1 = z[i, j], z[i, j + 1]
        t = (level - z0) / (z1 - z0)
        return (x[i], y[j] + t * (y[j + 1] - y[j]))

    # collect undirected segments between edge identities (exact keys, so
    # chaining across cells never depends on float tolerances)
    adjacency = {}

    def add_segment(e1, e2):
        adjacency.setdefault(e1, []).append(e2)
        adjacency.setdefault(e2, []).append(e1)

    for i in range(nx - 1):
        for j in range(ny - 1):
            b0, b1 = above[i, j], above[i + 1, j]
            b2, b3 = above[i + 1, j + 1], above[i, j + 1]
            case = int(b0) + 2 * int(b1) + 4 * int(b2) + 8 * int(b3)
            if case in (0, 15):
                continue
            B, T = ('h', i, j), ('h', i, j + 1)
            L, R = ('v', i, j), ('v', i + 1, j)
            table = {1: [(L, B)], 2: [(B, R)], 3: [(L, R)], 4: [(R, T)],
                     6: [(B, T)], 7: [(L, T)], 8: [(T, L)], 9: [(B, T)],
                     11: [(R, T)], 12: [(L, R)], 13: [(B, R)], 14: [(L, B)]}
            if case in (5, 10):
                center_above = 0.25 * (z[i, j] + z[i + 1, j] + z[i + 1, j + 1] + z[i, j + 1]) > level
                if (case == 5) == center_above:
                    segs = [(L, T), (B, R)]
                else:
                    segs = [(L, B), (T, R)]
            else:
                segs = table[case]
            for e1, e2 in segs:
                add_segment(e1, e2)

    # chain the segment soup into polylines: open paths start at degree-1
    # nodes, remaining cycles at any unvisited node
    visited = set()  # undirected (e1, e2) pairs, canonical order
    paths = []

    def seg_key(e1, e2):
        return (e1, e2) if e1 <= e2 else (e2, e1)

    def walk(start):
        path = [start]
        node = start
        while True:
            nxt = None
            for nb in adjacency[node]:
                if seg_key(node, nb) not in visited:
                    nxt = nb
                    break
            if nxt is None:
                break
            visited.add(seg_key(node, nxt))
            path.append(nxt)
            node = nxt
        return path

    starts = [e for e, nbs in adjacency.items() if len(nbs) == 1]
    for start in starts:
        if all(seg_key(start, nb) in visited for nb in adjacency[start]):
            continue
        path = walk(start)
        if len(path) > 1:
            paths.append(path)
    for e in adjacency:  # closed loops
        if any(seg_key(e, nb) not in visited for nb in adjacency[e]):
            paths.append(walk(e))
    return [np.array([edge_point(*e) for e in path]) for path in paths if len(path) > 1]


def deep_eq(obj1, obj2):
    """Deep equality supporting arrays, dicts, sequences."""
    if type(obj1) is not type(obj2):
        return False
    if isinstance(obj1, dict):
        if obj1.keys() != obj2.keys():
            return False
        return all(deep_eq(obj1[k], obj2[k]) for k in obj1)
    if isinstance(obj1, (tuple, list)):
        if len(obj1) != len(obj2):
            return False
        return all(deep_eq(o1, o2) for o1, o2 in zip(obj1, obj2))
    if isinstance(obj1, np.ndarray):
        return obj1.shape == obj2.shape and np.all(obj1 == obj2)
    try:
        return bool(obj1 == obj2)
    except Exception:
        return obj1 is obj2


class Monitor(BaseClass):
    """Wall-time (and optionally RSS memory) monitor — counterpart of the
    reference's per-calculator ``Monitor`` (ref utils.py:734). Usable as a
    context manager or via start()/stop(); ``get('time')`` returns the
    accumulated quantity, ``counter`` the number of stop() calls.

    Note the framework's hot path is one fused XLA program, so per-node
    timing belongs to ``Pipeline.profile_speed`` (which uses this class's
    semantics at the node level for blocking decisions); Monitor remains for
    host-side sections (IO, init, host-eval nodes)."""

    def __init__(self, quantities='time'):
        if isinstance(quantities, str):
            quantities = (quantities,)
        self.quantities = list(quantities)
        self.reset()

    def time(self):
        import time
        return time.perf_counter()

    def mem(self):
        import resource
        # peak RSS in MB (ru_maxrss is KB on Linux)
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e3

    def reset(self):
        self.counter = 0
        self._diffs = {q: 0. for q in self.quantities}
        self.start()

    def start(self):
        self._start = {q: getattr(self, q)() for q in self.quantities}

    def stop(self):
        now = {q: getattr(self, q)() for q in self.quantities}
        self.counter += 1
        for q in self.quantities:
            self._diffs[q] += now[q] - self._start[q]
        self._start = now

    def get(self, quantity, average=False):
        value = self._diffs[quantity]
        if average:
            return value / max(self.counter, 1)
        return value

    def __enter__(self):
        self.reset()
        return self

    def __exit__(self, *exc):
        self.stop()


class TaskManager(BaseClass):
    """Deterministic task distribution over JAX processes — the
    multi-controller counterpart of the reference's MPI ``TaskManager``
    (ref utils.py:1040: communicator splitting, no manager rank). Under a
    single controller every task runs locally; under
    ``parallel.distributed.initialize()`` each process gets a deterministic
    contiguous slice (same rule as ``parallel.distributed.local_chain_slice``).

    >>> with TaskManager() as tm:
    ...     for task in tm.iterate(tasks):
    ...         ...
    """

    def __init__(self, nprocs_per_task=1):
        self.nprocs_per_task = max(int(nprocs_per_task), 1)

    @property
    def nworkers(self):
        import jax
        return max(jax.process_count() // self.nprocs_per_task, 1)

    @property
    def worker(self):
        import jax
        return (jax.process_index() // self.nprocs_per_task) % self.nworkers

    def iterate(self, tasks):
        """Yield the subset of ``tasks`` assigned to this process's worker
        group (deterministic round-robin, identical on every process of the
        group)."""
        for i, task in enumerate(tasks):
            if i % self.nworkers == self.worker:
                yield task

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return None


def mkdir(dirname, **kwargs):
    """Create directory ``dirname`` (no-op if it exists) — ref utils.mkdir."""
    import os
    kwargs.setdefault('exist_ok', True)
    if dirname:
        os.makedirs(dirname, **kwargs)


def is_path(item):
    """True if ``item`` is a filesystem-path-like object (str / os.PathLike)
    — ref utils.is_path."""
    import os
    return isinstance(item, (str, os.PathLike))


def import_class(clsname, pythonpath=None, registry=None):
    """Resolve a class from ``'module.ClassName'`` (optionally rooted at
    ``pythonpath``), a bare class name looked up in ``registry``, or pass a
    type through unchanged — ref utils.import_class."""
    import importlib
    import sys
    if isinstance(clsname, type):
        return clsname
    name = str(clsname)
    if '.' in name:
        modname, name = name.rsplit('.', 1)
        if pythonpath is not None:
            sys.path.insert(0, str(pythonpath))
        try:
            module = importlib.import_module(modname)
        finally:
            if pythonpath is not None:
                sys.path.remove(str(pythonpath))
        return getattr(module, name)
    matches = [cls for cls in (registry or ()) if cls.__name__ == name]
    if len(matches) == 1:
        return matches[0]
    if len(matches) > 1:
        raise ImportError('multiple classes named {} in registry'.format(name))
    raise ImportError('unknown class {}; give module_name.ClassName or a registry'.format(name))


def rebin(array, new_shape, statistic=None):
    """Down-bin ``array`` to ``new_shape`` (each new axis size must divide the
    old one) by applying ``statistic`` (default: sum) over the collapsed
    blocks — ref utils.rebin."""
    import numpy as np
    array = np.asarray(array)
    if np.ndim(new_shape) == 0:
        new_shape = (int(new_shape),)
    new_shape = tuple(int(s) for s in new_shape)
    if array.ndim != len(new_shape):
        raise ValueError('cannot rebin {}-d array to {}-d shape'.format(array.ndim, len(new_shape)))
    if statistic is None:
        statistic = np.sum
    shape = []
    for new, old in zip(new_shape, array.shape):
        if old % new != 0:
            raise ValueError('new shape {} does not divide input shape {}'.format(new_shape, array.shape))
        shape += [new, old // new]
    reshaped = array.reshape(shape)
    # collapse every block axis (odd positions), from the last to keep indices valid
    for axis in range(len(new_shape) - 1, -1, -1):
        reshaped = statistic(reshaped, axis=2 * axis + 1)
    return reshaped


def cov_to_corrcoef(cov):
    """Correlation matrix of covariance ``cov`` (scalar input → 1) —
    ref utils.cov_to_corrcoef."""
    import numpy as np
    if np.ndim(cov) == 0:
        return 1.
    std = np.sqrt(np.diag(cov).real)
    return cov / std[:, None] / std[None, :]


def subspace(X, precision=None, npcs=None, chi2min=None, fweights=None, aweights=None):
    """Principal subspace of samples ``X`` (nsamples, ndim), optionally
    whitened by ``precision`` (arXiv:2009.03311 compression): returns the
    (ndim, npcs) projection onto the leading eigenvectors of the (whitened)
    sample covariance. ``chi2min`` picks the smallest number of trailing
    components whose cumulative eigenvalue sum stays above it —
    ref utils.subspace."""
    import numpy as np
    X = np.asarray(X).reshape(np.shape(X)[0], -1)
    L = np.linalg.cholesky(precision) if precision is not None else np.array(1.)
    Xw = X.dot(L) if precision is not None else X
    cov = np.cov(Xw, rowvar=False, ddof=0, fweights=fweights, aweights=aweights)
    eigenvalues, eigenvectors = np.linalg.eigh(np.atleast_2d(cov))
    if npcs is None:
        npcs = (len(eigenvalues) if chi2min is None
                else len(eigenvalues) - int(np.sum(np.cumsum(eigenvalues) < chi2min)))
    if npcs > len(eigenvalues):
        raise ValueError('requested {} components > dimension {}'.format(npcs, len(eigenvalues)))
    basis = eigenvectors[..., len(eigenvalues) - npcs:]
    return L.dot(basis) if precision is not None else basis


def weights_trapz(x):
    """Trapezoidal integration weights for nodes ``x`` — ref utils.weights_trapz."""
    import numpy as np
    x = np.asarray(x, dtype='f8')
    if x.size == 0:
        return np.array(1.)
    if x.size == 1:
        return np.ones(1)
    w = np.zeros_like(x)
    dx = np.diff(x)
    w[:-1] += dx / 2.
    w[1:] += dx / 2.
    return w


def weights_leggauss(nx, sym=False):
    """Gauss-Legendre nodes/weights on [-1, 1]; with ``sym=True`` fold a
    2*nx rule onto the non-negative half axis (for integrands even in x) —
    ref utils.weights_leggauss."""
    import numpy as np
    x, w = np.polynomial.legendre.leggauss((1 + bool(sym)) * int(nx))
    if sym:
        x, w = x[nx:], (w[nx:] + w[nx - 1::-1]) / 2.
    return x, w


def weights_mu(mu, method='leggauss'):
    """mu nodes/weights on [0, 1] for multipole projection: int count of
    nodes or explicit node array (method='trapz') — ref utils.weights_mu."""
    import numpy as np
    if method == 'trapz':
        if np.ndim(mu) == 0:
            mu = np.linspace(0., 1., int(mu))
        mu = np.asarray(mu, dtype='f8')
        return mu, weights_trapz(mu) / (mu[-1] - mu[0])
    if method == 'leggauss':
        if np.ndim(mu) != 0:
            raise ValueError('leggauss takes a node count, not a node array')
        return weights_leggauss(int(mu), sym=True)
    raise ValueError('unknown mu-integration method {}'.format(method))


def matrix_lininterp(xin, xout):
    """(nin, nout) linear-interpolation matrix in the reference's convention
    (f(xout) ~= f(xin) @ M; ref utils.matrix_lininterp). The observables
    layer's ``window.matrix_lininterp`` uses the transposed (nout, nin)
    layout — this wrapper adapts it and zeroes out-of-range columns as the
    reference does (no constant extrapolation)."""
    import numpy as np
    from .observables.window import matrix_lininterp as _lininterp
    xin = np.asarray(xin, dtype='f8')
    xout = np.asarray(xout, dtype='f8')
    M = _lininterp(xout, xin).T
    inside = (xout >= xin[0]) & (xout <= xin[-1] + 1e-12 * max(abs(xin[-1]), 1.))
    return M * inside[None, :]


def inv(mat, check_valid='raise'):
    """Stable matrix inverse — re-export of ops.linalg.inv (ref utils.inv)."""
    from .ops.linalg import inv as _inv
    return _inv(mat, check_valid=check_valid)


def blockinv(blocks, inv=None):
    """Block-matrix inverse — re-export of ops.linalg.blockinv (ref utils.blockinv)."""
    import numpy as np
    from .ops.linalg import blockinv as _blockinv
    if inv is None:
        inv = np.linalg.inv
    return _blockinv(blocks, inv=inv)


def forward_module_getattr(*providers):
    """Module ``__getattr__`` (PEP 562) forwarding attribute lookups to
    ``providers`` (module paths, tried in order). Used by the reference
    import-path shim modules (e.g. ``desilike_tpu.theories.galaxy_clustering``
    mirrors reference ``desilike/theories/galaxy_clustering/__init__.py``)
    so that reference-style imports resolve without duplicating exports."""
    import importlib

    def __getattr__(name):
        if not name.startswith('_'):
            for provider in providers:
                mod = importlib.import_module(provider)
                try:
                    return getattr(mod, name)
                except AttributeError:
                    pass
        raise AttributeError('module shim has no attribute {!r} (searched {})'
                             .format(name, providers))
    return __getattr__
