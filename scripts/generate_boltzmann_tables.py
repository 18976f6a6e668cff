#!/usr/bin/env python
"""Generate the Boltzmann-truth table archive for the emulated engine.

Run this on a machine with a Boltzmann code installed (cosmoprimo[class],
classy, or camb — probed in that order); this repo's container has none by
design (zero egress). Consumes a grid spec written by
``desilike_tpu.cosmology.emulator.write_grid_spec`` and writes the tables
archive ``train_pk_emulator`` consumes:

    python scripts/generate_boltzmann_tables.py spec.npz tables.npz

Spec archive:   meta (json: param_names), X (n, ndim), k_grid (nk,), z_grid (nz,)
Tables archive: the same arrays plus pk (n, nz, nk) [(Mpc/h)^3] and
                rs_drag (n,) [Mpc/h].
"""

import json
import sys

import numpy as np


def _make_provider():
    """Return fn(params: dict, k, z_grid) -> (pk (nz, nk), rs_drag)."""
    try:
        from cosmoprimo import Cosmology

        def provider(params, k, z_grid):
            cosmo = Cosmology(engine='class', **params)
            fo = cosmo.get_fourier()
            interp = fo.pk_interpolator(of='delta_m')
            pk = np.stack([interp(k, z=z) for z in z_grid])
            return pk, cosmo.rs_drag * cosmo.h  # Mpc -> Mpc/h

        return provider, 'cosmoprimo[class]'
    except ImportError:
        pass
    try:
        from classy import Class

        def provider(params, k, z_grid):
            h = params['h']
            cosmo = Class()
            cosmo.set({'output': 'mPk', 'P_k_max_h/Mpc': float(k[-1]) * 1.1,
                       'z_max_pk': float(z_grid[-1]),
                       'h': h, 'omega_cdm': params['omega_cdm'],
                       'omega_b': params['omega_b'],
                       'ln10^{10}A_s': params.get('logA', 3.044),
                       'n_s': params.get('n_s', 0.9649),
                       'N_ur': params.get('N_ur', 2.0328),
                       'N_ncdm': 1, 'm_ncdm': params.get('m_ncdm', 0.06)})
            cosmo.compute()
            pk = np.array([[cosmo.pk_lin(kk * h, z) * h ** 3 for kk in k] for z in z_grid])
            rs = cosmo.rs_drag() * h
            cosmo.struct_cleanup()
            return pk, rs

        return provider, 'classy'
    except ImportError:
        pass
    raise SystemExit('no Boltzmann provider found: install cosmoprimo[class] or classy')


def main(spec_fn, out_fn):
    spec = np.load(spec_fn, allow_pickle=False)
    names = json.loads(str(spec['meta']))['param_names']
    X, k, z_grid = spec['X'], spec['k_grid'], spec['z_grid']
    provider, backend = _make_provider()
    print(f'[{backend}] {X.shape[0]} points, {len(k)} k x {len(z_grid)} z')
    pk = np.empty((X.shape[0], len(z_grid), len(k)))
    rs = np.empty(X.shape[0])
    for i, row in enumerate(X):
        pk[i], rs[i] = provider(dict(zip(names, row)), k, z_grid)
        if (i + 1) % 50 == 0:
            print(f'  {i + 1}/{X.shape[0]}')
    np.savez(out_fn, meta=spec['meta'], X=X, k_grid=k, z_grid=z_grid, pk=pk, rs_drag=rs)
    print(f'wrote {out_fn}')


if __name__ == '__main__':
    main(*sys.argv[1:3])
