"""Reference import-path shim + helpers: ``desilike.jax`` (ref jax.py).

The reference keeps a numpy/jax dispatch layer because jax is optional
there; here jax is the substrate, so most helpers are trivial — but the
names are kept so reference code (``from desilike.jax import numpy as jnp``,
``interp1d``, ``use_jax``, ``opmask``, ...) runs unchanged.
"""

import numpy as np
import jax as _jax
import jax.numpy as numpy  # noqa: F401  — the reference idiom: `from desilike.jax import numpy`

from .ops.interp import interp1d as _interp1d

array_types = (_jax.Array,)

jit = _jax.jit


def use_jax(*arrays):
    """Whether any input is a jax array (ref jax.py use_jax)."""
    return any(isinstance(array, array_types) for array in arrays)


def to_nparray(array):
    """Convert to a host numpy array (ref jax.py to_nparray)."""
    return np.asarray(array)


def numpy_jax(*args, return_use_jax=False):
    """Return the numpy-compatible module to operate on the inputs — always
    jax.numpy here (host scalars trace fine); kept for interface parity
    (ref jax.py numpy_jax)."""
    uj = use_jax(*args)
    if return_use_jax:
        return numpy, uj
    return numpy


def interp1d(xq, x, f, method='cubic'):
    """Jit-safe 1-D interpolation (ref jax.py:211 wraps interpax; here the
    in-framework ops.interp implementation)."""
    return _interp1d(xq, x, f, method=method)


def cond(pred, true_fun, false_fun, *operands):
    """lax.cond for traced predicates, Python branch for concrete ones
    (ref jax.py cond)."""
    if isinstance(pred, _jax.core.Tracer):
        return _jax.lax.cond(pred, true_fun, false_fun, *operands)
    return true_fun(*operands) if pred else false_fun(*operands)


def opmask(array, mask, value, op='set'):
    """Masked set/add working on jax and numpy arrays (ref jax.py opmask)."""
    if use_jax(array, mask, value):
        array = numpy.asarray(array)
        if op == 'set':
            return array.at[mask].set(value)
        if op == 'add':
            return array.at[mask].add(value)
    else:
        array = np.array(array)
        if op == 'set':
            array[mask] = value
            return array
        if op == 'add':
            array[mask] += value
            return array
    raise ValueError('unknown op {}'.format(op))


def exception(fun, *args):
    """Host-side debug print of inputs inside traced code (the role of ref
    jax.py exception_jax): uses jax.debug.callback so it is trace-safe."""
    _jax.debug.callback(lambda *a: fun(*a), *args)


def dist_name(dist):
    """Name of a scipy(-like) frozen distribution (ref jax.py dist_name)."""
    dist = getattr(dist, 'dist', dist)
    return getattr(dist, 'name', dist.__class__.__name__.replace('_gen', ''))


from .utils import forward_module_getattr as _fwd  # noqa: E402

__getattr__ = _fwd('desilike_tpu.parameters', 'desilike_tpu.compat')
