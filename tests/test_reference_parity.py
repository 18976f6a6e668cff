"""Mechanical reference-parity gate: run the four audit scripts (class
names, constructor kwargs, YAML parameter basenames, container methods,
notebook imports) against /root/reference and assert zero gaps.

Skipped when the reference tree is not present (the audits are
build-environment tooling, not a runtime dependency)."""

import os
import sys

import pytest

REF = '/root/reference/desilike'
SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'scripts')

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference tree not available')


def _load(name):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, os.path.join(SCRIPTS, name + '.py'))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_class_name_parity():
    missing = _load('parity_audit').main()
    # remaining unresolved names are internal helpers or documented
    # exclusions (compat.py:300); none may be user-facing model/sampler/
    # likelihood/observable classes
    internal = {
        # registry metaclasses + in-file machinery of the reference's MCMC
        # (ref samplers/mcmc.py:25 MHSampler, :158 SOSampler — not exported
        # from samplers/__init__; the public MCMCSampler resolves)
        'RegisteredSampler', 'RegisteredProfiler', 'ProfilerState',
        'MHSampler', 'SOSampler',
    }
    user_facing = [n for names in missing.values() for n in names
                   if n not in internal
                   and any(k in n for k in ('Sampler', 'Profiler', 'Likelihood',
                                            'Observable', 'Template', 'Multipoles',
                                            'Emulator', 'Chain'))]
    assert not user_facing, user_facing


def test_kwarg_surface_parity():
    assert _load('signature_audit').main() == 0


def test_param_name_parity():
    assert _load('param_audit').main() == 0


def test_container_method_parity():
    assert _load('method_audit').main() == 0


def test_notebook_import_parity():
    assert _load('notebook_audit').main() == 0
