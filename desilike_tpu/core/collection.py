"""CollectionCalculator and the batch-evaluation facade.

Counterparts of reference base.py:1325 (CollectionCalculator) and base.py:232
(vmap): the collection treats N calculators as one node with namespaced
states; the vmap facade batches a pipeline function over parameter arrays
with an error policy (non-finite results masked or raised).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .calculator import Calculator


class CollectionCalculator(Calculator):
    """Treats a list of calculators as one (reference base.py:1325): derived
    states are exposed as '{i}_{name}'."""

    def initialize(self, calculators=None):
        self.calculators = list(calculators or [])
        self.requires = list(self.calculators)

    def calculate(self, **params):
        pass

    def __getstate__(self):
        state = {}
        for i, calc in enumerate(self.calculators):
            for name, value in calc.__getstate__().items():
                state['{}_{}'.format(i, name)] = value
        return state

    def __len__(self):
        return len(self.calculators)

    def __iter__(self):
        return iter(self.calculators)

    def __getitem__(self, i):
        return self.calculators[i]


def vmap(fn, errors='nan', backend=None, ref_values=None):
    """Batch a pure pipeline function over dicts of parameter arrays.

    Counterpart of the reference's triple-backend vmap (plain loop / jax /
    MPI, base.py:232-383): on TPU there is one backend — jax.vmap inside jit,
    optionally sharded over the device mesh by the caller.

    Error policy (reference per-point error capture, base.py:232-258; under
    XLA a failed point is a non-finite row, not a Python exception):

    - 'nan' (default): non-finite outputs stay NaN for the caller to mask;
    - 'raise': raise FloatingPointError naming the failed batch indices;
    - 'ref': replace failed rows with the output at ``ref_values``
      (the reference-state replacement policy, base.py:253).
    """
    vfn = jax.jit(jax.vmap(fn))

    def _bad_rows(out):
        """Batch indices with any non-finite leaf entry."""
        good = None
        for leaf in jax.tree.leaves(out):
            ok = jnp.all(jnp.isfinite(leaf), axis=tuple(range(1, leaf.ndim)))
            good = ok if good is None else (good & ok)
        return np.flatnonzero(~np.asarray(good)) if good is not None else np.array([], dtype=int)

    def wrapper(values):
        values = {k: jnp.atleast_1d(jnp.asarray(v)) for k, v in values.items()}
        out = vfn(values)
        if errors == 'raise':
            bad = _bad_rows(out)
            if bad.size:
                raise FloatingPointError('non-finite results in batched evaluation '
                                         'at indices {}'.format(bad.tolist()))
        elif errors == 'ref':
            if ref_values is None:
                raise ValueError("errors='ref' requires ref_values (reference parameter dict)")
            bad = _bad_rows(out)
            if bad.size:
                ref_out = fn({k: jnp.asarray(v) for k, v in ref_values.items()})
                good = jnp.ones(jax.tree.leaves(out)[0].shape[0], dtype=bool).at[jnp.asarray(bad)].set(False)
                out = jax.tree.map(
                    lambda leaf, ref: jnp.where(good.reshape((-1,) + (1,) * (leaf.ndim - 1)),
                                                leaf, jnp.asarray(ref, dtype=leaf.dtype)),
                    out, ref_out)
        return out

    return wrapper
