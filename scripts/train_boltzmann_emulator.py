#!/usr/bin/env python
"""Train the emulated Boltzmann engine from a truth-table archive.

    python scripts/train_boltzmann_emulator.py tables.npz weights.npz \
        [--hidden 128,128] [--nsteps 8000]

``tables.npz`` comes from scripts/generate_boltzmann_tables.py (or any
archive with meta/X/k_grid/z_grid/pk/rs_drag). The weights archive loads
directly into ``Cosmology(engine='emulator', emulator='weights.npz')``.
"""

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('tables')
    ap.add_argument('weights')
    ap.add_argument('--hidden', default='128,128')
    ap.add_argument('--nsteps', type=int, default=8000)
    ap.add_argument('--learning-rate', type=float, default=3e-3)
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    from desilike_tpu.cosmology import emulator as emu

    tables = np.load(args.tables, allow_pickle=False)
    names = tuple(json.loads(str(tables['meta']))['param_names'])
    X, k, z = tables['X'], tables['k_grid'], tables['z_grid']
    print(f'targets: {X.shape[0]} points')
    Y = emu.make_targets(names, X, tables['pk'], tables['rs_drag'], k, z)
    hidden = tuple(int(h) for h in args.hidden.split(','))
    weights = emu.train_pk_emulator(names, X, Y, k, z, hidden=hidden,
                                    nsteps=args.nsteps, learning_rate=args.learning_rate)
    emu.save_weights(args.weights, weights)
    print(f"wrote {args.weights}: holdout max |pk err| = {weights['holdout_err']:.2e}, "
          f"train loss = {weights['loss']:.3e}")


if __name__ == '__main__':
    main()
