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


def vmap(fn, errors='nan', backend=None):
    """Batch a pure pipeline function over dicts of parameter arrays.

    Counterpart of the reference's triple-backend vmap (plain loop / jax /
    MPI, base.py:232-383): on TPU there is one backend — jax.vmap inside jit,
    optionally sharded over the device mesh by the caller.

    errors: 'nan' (default) leaves non-finite outputs as NaN for the caller
    to mask; 'raise' checks and raises on any non-finite result (host-side).
    """
    vfn = jax.jit(jax.vmap(fn))

    def wrapper(values):
        values = {k: jnp.atleast_1d(jnp.asarray(v)) for k, v in values.items()}
        out = vfn(values)
        if errors == 'raise':
            leaves = jax.tree.leaves(out)
            for leaf in leaves:
                if not bool(jnp.all(jnp.isfinite(leaf))):
                    raise FloatingPointError('non-finite results in batched evaluation')
        return out

    return wrapper
