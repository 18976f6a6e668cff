"""API-parity audit: enumerate public classes/functions in the reference
(/root/reference/desilike, parsed with ast — the reference is not importable
in this container) and check each name resolves through desilike_tpu, either
natively or via the compat alias layer.

Usage: python scripts/parity_audit.py [--all]
Prints unresolved names grouped by reference module.
"""
import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = '/root/reference/desilike'

# Reference subtrees whose public names we audit, mapped to the desilike_tpu
# namespaces we try to resolve them in (in order).
SKIP_DIRS = {'tests', 'examples', '__pycache__'}

# Deliberate scope exclusions (documented in BASELINE.md / VERDICT): the MPI
# layer (GSPMD sharding replaces it).  Clik-era class names are NOT excluded:
# they alias the native Planck 2018 reimplementations (likelihoods/cmb).
EXCLUDED_SUBSTR = ()
EXCLUDED_MODULES = ('mpi',)


def public_defs(path):
    with open(path) as f:
        try:
            tree = ast.parse(f.read())
        except SyntaxError:
            return []
    names = []
    for node in tree.body:
        if isinstance(node, (ast.ClassDef,)) and not node.name.startswith('_'):
            names.append(node.name)
    return names


def collect():
    out = {}
    for root, dirs, files in os.walk(REF):
        dirs[:] = [d for d in dirs if d not in SKIP_DIRS]
        for fn in files:
            if not fn.endswith('.py'):
                continue
            mod = os.path.relpath(os.path.join(root, fn), REF)[:-3].replace('/', '.')
            if any(part in EXCLUDED_MODULES for part in mod.split('.')):
                continue
            names = public_defs(os.path.join(root, fn))
            if names:
                out[mod] = names
    return out


def main():
    import importlib
    import desilike_tpu
    namespaces = [desilike_tpu]
    for sub in ('theories', 'observables', 'likelihoods', 'samplers', 'profilers',
                'samples', 'emulators', 'bindings', 'parameters', 'core',
                'likelihoods.cmb', 'likelihoods.supernovae', 'compat',
                'utils', 'io', 'samples.diagnostics', 'samples.plotting',
                'bindings.cobaya', 'bindings.cosmosis', 'bindings.montepython',
                'cosmology', 'ops', 'parallel'):
        try:
            namespaces.append(importlib.import_module('desilike_tpu.' + sub))
        except Exception as exc:
            print(f'IMPORT FAIL desilike_tpu.{sub}: {exc}')

    def resolves(name):
        for ns in namespaces:
            try:
                if getattr(ns, name, None) is not None:
                    return True
            except Exception:
                pass
        return False

    refs = collect()
    n_total = n_ok = 0
    missing = {}
    for mod in sorted(refs):
        for name in refs[mod]:
            if any(s in name for s in EXCLUDED_SUBSTR):
                continue
            n_total += 1
            if resolves(name):
                n_ok += 1
            else:
                missing.setdefault(mod, []).append(name)
    print(f'resolved {n_ok}/{n_total} public reference classes')
    for mod in sorted(missing):
        print(f'  {mod}: {", ".join(missing[mod])}')
    return missing


if __name__ == '__main__':
    main()
