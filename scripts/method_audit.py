"""Method-surface parity audit for the user-facing containers: public
methods/properties of the reference's Chain/Profiles/Samples/Parameter*/
LikelihoodFisher/ObservableArray/ObservableCovariance classes (parsed with
ast) vs what our same-named classes expose.

Usage: python scripts/method_audit.py
"""
import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = '/root/reference/desilike'

TARGETS = {
    'Chain': 'samples/chain.py',
    'Profiles': 'samples/profiles.py',
    'Samples': 'parameter.py',
    'Parameter': 'parameter.py',
    'ParameterCollection': 'parameter.py',
    'ParameterPrior': 'parameter.py',
    'ParameterCovariance': 'parameter.py',
    'ParameterPrecision': 'parameter.py',
    'LikelihoodFisher': 'fisher.py',
    'Fisher': 'fisher.py',
    'ObservableArray': 'observables/types.py',
    'ObservableCovariance': 'observables/types.py',
    'Installer': 'install.py',
    'BaseCalculator': 'base.py',
}

# MPI-era and serialization-plumbing methods with no counterpart in a
# mesh-sharded, pytree-native design (documented in docs/migration.md).
ACCEPTED = {
    'Chain': {'bcast', 'sendrecv', 'send', 'recv', 'to_anesthetic'},
    'Samples': {'bcast', 'sendrecv', 'send', 'recv'},
    'Profiles': {'bcast'},
    'BaseCalculator': {'mpicomm'},
    'Fisher': {'mpicomm'},
    'ParameterCollection': {'updated'},  # lives on the YAML-config layer here
    'Installer': {'pip', 'download', 'extract', 'setenv'},  # zero-egress build
}


def ref_members(clsname, relpath):
    with open(os.path.join(REF, relpath)) as f:
        tree = ast.parse(f.read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == clsname:
            out = set()
            for item in node.body:
                if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)) and not item.name.startswith('_'):
                    out.add(item.name)
            return out
    return None


def resolve(name):
    import importlib
    for mod in ('desilike_tpu', 'desilike_tpu.samples', 'desilike_tpu.parameters',
                'desilike_tpu.observables', 'desilike_tpu.compat'):
        cls = getattr(importlib.import_module(mod), name, None)
        if cls is not None:
            return cls
    return None


def make_instance(name, cls):
    """Cheap sample instance so instance attributes count as present."""
    import numpy as np
    try:
        if name == 'Chain':
            return cls({'x': np.zeros(4), 'logposterior': np.zeros(4)})
        if name == 'Samples':
            return cls({'x': np.zeros(4)})
        if name == 'Parameter':
            return cls(basename='x')
        if name == 'ParameterCollection':
            return cls([{'basename': 'x'}])
        if name == 'ParameterPrior':
            return cls(dist='norm', loc=0., scale=1.)
        if name in ('ParameterCovariance', 'ParameterPrecision'):
            return cls(np.eye(2), params=['a', 'b'])
        if name == 'LikelihoodFisher':
            from desilike_tpu.parameters import ParameterCollection
            return cls(np.zeros(2), ParameterCollection([{'basename': 'a'}, {'basename': 'b'}]),
                       -np.eye(2))
        if name == 'Profiles':
            return cls()
        if name == 'ObservableArray':
            return cls(x=[np.linspace(0., 1., 5)], value=[np.zeros(5)], projs=[0])
        if name == 'ObservableCovariance':
            o = make_instance('ObservableArray', resolve('ObservableArray'))
            return cls(np.eye(5), observables=[o])
        if name == 'Installer':
            return cls()
        if name == 'BaseCalculator':
            class _C(cls):
                def calculate(self):
                    pass
            return _C()
        if name == 'Fisher':
            return None  # needs a likelihood; class-only probe + run alias
    except Exception:
        return None
    return None


def main():
    problems = 0
    for name, relpath in sorted(TARGETS.items()):
        members = ref_members(name, relpath)
        if members is None:
            print(f'?? {name}: not found in reference {relpath}')
            continue
        cls = resolve(name)
        if cls is None:
            print(f'MISSING CLASS {name}')
            problems += 1
            continue
        obj = make_instance(name, cls)
        probe = obj if obj is not None else cls
        missing = sorted(m for m in members
                         if not hasattr(probe, m) and m not in ACCEPTED.get(name, set()))
        if missing:
            problems += 1
            tag = '' if obj is not None else ' (class-only probe)'
            print(f'{name}: missing {missing}{tag}')
    print(f'\n{problems} classes with method gaps')
    return problems


if __name__ == '__main__':
    main()
