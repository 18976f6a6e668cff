"""Emulated-Cl engine: full C_ell recomputation per evaluation via MLP.

Shares the generic trainer of :mod:`desilike_tpu.cosmology.emulator` (the
pk engine). The network maps cosmological parameters to D_ell =
ell(ell+1) C_ell / 2pi sampled on a fixed node grid (dense at low ell,
log-spaced through the acoustic regime); inference interpolates back to
every ell. This is the path that lifts ClTheory's Taylor-response limit —
a joint fit can move n_s/omega_cdm arbitrarily within the training box and
the Cls are recomputed, not extrapolated (reference recomputes with CLASS,
cmb/base.py:16).

Workflow mirrors the pk engine: a CLASS-equipped host evaluates raw
(dimensionless) C_ell tables on a parameter grid ->
``train_cl_emulator`` -> weights -> ``ClTheory(emulator=weights)``.
"""

import numpy as np
import jax.numpy as jnp

from ...cosmology.emulator import train_mlp, predict_raw, save_weights, load_weights  # noqa: F401 (re-exported)


def ell_nodes(lmax, dense_until=32, nlog=72):
    """Node grid: every ell up to ``dense_until``, log-spaced beyond (the
    acoustic oscillations have period ~300 at high ell — comfortably
    resolved)."""
    dense = np.arange(2, min(dense_until, lmax) + 1)
    if lmax > dense_until:
        log = np.unique(np.geomspace(dense_until + 1, lmax, nlog).astype('i8'))
        return np.concatenate([dense, log])
    return dense


def _dl_at(cl_row, nodes):
    nodes = np.asarray(nodes)
    return cl_row[nodes] * nodes * (nodes + 1.) / (2. * np.pi)


def make_cl_targets(cls_tables, nodes):
    """cls_tables: {xy: (n, >=lmax+1)} raw C_ell tables over n parameter
    points. Returns (spectra tuple, Y (n, nspec*nnodes))."""
    spectra = tuple(sorted(cls_tables))
    n = next(iter(cls_tables.values())).shape[0]
    Y = np.concatenate([np.stack([_dl_at(np.asarray(cls_tables[xy][i], dtype='f8'), nodes)
                                  for i in range(n)]) for xy in spectra], axis=1)
    return spectra, Y


def train_cl_emulator(names, X, cls_tables, fiducial=None, lmax=None,
                      hidden=(128, 128), nsteps=8000, learning_rate=3e-3,
                      seed=3, holdout=0.1, **node_kwargs):
    """Train the Cl MLP. ``cls_tables``: {xy: (n, nell)} raw C_ell.
    ``fiducial``: {param: value} expansion/reporting point stored in the
    weights (used as the registered parameter defaults). Returns weights
    with 'holdout_err' = max held-out D_ell error relative to each
    spectrum's peak."""
    if lmax is None:
        lmax = min(tab.shape[1] for tab in cls_tables.values()) - 1
    nodes = ell_nodes(lmax, **node_kwargs)
    spectra, Y = make_cl_targets({xy: np.asarray(tab)[:, :lmax + 1]
                                  for xy, tab in cls_tables.items()}, nodes)
    weights = train_mlp(names, X, Y, hidden=hidden, nsteps=nsteps,
                        learning_rate=learning_rate, seed=seed, holdout=holdout)
    idx_ho = weights.pop('_holdout_idx')
    weights['ell_nodes'] = np.asarray(nodes, dtype='f8')
    weights['spectra'] = spectra
    weights['lmax'] = int(lmax)
    weights['fiducial'] = {k: float(v) for k, v in (fiducial or {}).items()}
    pred = np.asarray(predict_raw(weights, jnp.asarray(np.asarray(X)[idx_ho])))
    truth = np.asarray(Y)[idx_ho]
    nn = len(nodes)
    errs = []
    for i, xy in enumerate(spectra):
        block = slice(i * nn, (i + 1) * nn)
        peak = np.abs(truth[:, block]).max()
        errs.append(np.abs(pred[:, block] - truth[:, block]).max() / peak)
    weights['holdout_err'] = float(max(errs))
    return weights


def predict_cls(weights, theta):
    """theta (ndim,) -> {xy: (lmax+1,) raw C_ell}, differentiable."""
    out = predict_raw(weights, theta)
    nodes = jnp.asarray(weights['ell_nodes'])
    lmax = int(weights['lmax'])
    ell = jnp.arange(lmax + 1, dtype=nodes.dtype)
    nn = nodes.shape[0]
    cls = {}
    for i, xy in enumerate(weights['spectra']):
        dl = jnp.interp(ell, nodes, out[i * nn:(i + 1) * nn])
        cls[xy] = jnp.where(ell >= 2, 2. * np.pi * dl / jnp.maximum(ell * (ell + 1.), 1.), 0.)
    return cls
