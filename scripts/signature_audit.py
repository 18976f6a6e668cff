"""Keyword/option-parity audit: for user-facing classes that exist in BOTH
the reference and desilike_tpu (same name, possibly via compat), compare the
reference's ``initialize`` keyword surface (parsed with ast — the reference
is not importable here) with what our class accepts.

A reference script migrating to desilike_tpu passes the reference's keyword
arguments; any keyword we neither accept nor swallow is a migration break.

Usage: python scripts/signature_audit.py
"""
import ast
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = '/root/reference/desilike'

# The flagship user-facing classes (SURVEY.md §2): name -> reference file.
TARGETS = {
    'TracerPowerSpectrumMultipolesObservable': 'observables/galaxy_clustering/power_spectrum.py',
    'TracerCorrelationFunctionMultipolesObservable': 'observables/galaxy_clustering/correlation_function.py',
    'ObservablesCovarianceMatrix': 'observables/galaxy_clustering/covariance.py',
    'ObservablesGaussianLikelihood': 'likelihoods/base.py',
    'BaseGaussianLikelihood': 'likelihoods/base.py',
    'SumLikelihood': 'likelihoods/base.py',
    'DampedBAOWigglesTracerPowerSpectrumMultipoles': 'theories/galaxy_clustering/bao.py',
    'ResummedBAOWigglesTracerPowerSpectrumMultipoles': 'theories/galaxy_clustering/bao.py',
    'FlexibleBAOWigglesTracerPowerSpectrumMultipoles': 'theories/galaxy_clustering/bao.py',
    'DampedBAOWigglesTracerCorrelationFunctionMultipoles': 'theories/galaxy_clustering/bao.py',
    'KaiserTracerPowerSpectrumMultipoles': 'theories/galaxy_clustering/full_shape.py',
    'EFTLikeKaiserTracerPowerSpectrumMultipoles': 'theories/galaxy_clustering/full_shape.py',
    'TNSTracerPowerSpectrumMultipoles': 'theories/galaxy_clustering/full_shape.py',
    'FOLPSAXTracerPowerSpectrumMultipoles': 'theories/galaxy_clustering/full_shape.py',
    'LPTVelocileptorsTracerPowerSpectrumMultipoles': 'theories/galaxy_clustering/full_shape.py',
    'REPTVelocileptorsTracerPowerSpectrumMultipoles': 'theories/galaxy_clustering/full_shape.py',
    'PyBirdTracerPowerSpectrumMultipoles': 'theories/galaxy_clustering/full_shape.py',
    'PNGTracerPowerSpectrumMultipoles': 'theories/galaxy_clustering/primordial_non_gaussianity.py',
    'BAOPowerSpectrumTemplate': 'theories/galaxy_clustering/power_template.py',
    'ShapeFitPowerSpectrumTemplate': 'theories/galaxy_clustering/power_template.py',
    'StandardPowerSpectrumTemplate': 'theories/galaxy_clustering/power_template.py',
    'DirectPowerSpectrumTemplate': 'theories/galaxy_clustering/power_template.py',
    'WiggleSplitPowerSpectrumTemplate': 'theories/galaxy_clustering/power_template.py',
    'BandVelocityPowerSpectrumTemplate': 'theories/galaxy_clustering/power_template.py',
    'TurnOverPowerSpectrumTemplate': 'theories/galaxy_clustering/power_template.py',
    'WindowedPowerSpectrumMultipoles': 'observables/galaxy_clustering/window.py',
    'WindowedCorrelationFunctionMultipoles': 'observables/galaxy_clustering/window.py',
    'FiberCollisionsPowerSpectrumMultipoles': 'observables/galaxy_clustering/window.py',
    'TopHatFiberCollisionsPowerSpectrumMultipoles': 'observables/galaxy_clustering/window.py',
    'BAOCompressionObservable': 'observables/galaxy_clustering/compression.py',
    'ShapeFitCompressionObservable': 'observables/galaxy_clustering/compression.py',
    'Fisher': 'fisher.py',
    'Differentiation': 'differentiation.py',
    'Emulator': 'emulators/__init__.py',
    'TaylorEmulatorEngine': 'emulators/__init__.py',
    'MLPEmulatorEngine': 'emulators/__init__.py',
    'MCMCSampler': 'samplers/mcmc.py',
    'NUTSSampler': 'samplers/nuts.py',
    'GridSampler': 'samplers/grid.py',
    'QMCSampler': 'samplers/qmc.py',
    'ImportanceSampler': 'samplers/importance.py',
    'EmceeSampler': 'samplers/emcee.py',
    'ZeusSampler': 'samplers/zeus.py',
    'ScipyProfiler': 'profilers/scipy.py',
    'OptaxProfiler': 'profilers/optax.py',
    'MinuitProfiler': 'profilers/minuit.py',
    'Chain': 'samples/chain.py',
    'Profiles': 'samples/profiles.py',
    'TracerBispectrumMultipolesObservable': 'observables/galaxy_clustering/bispectrum.py',
}


_CLASS_MAP = None


def _class_map():
    """Global name -> ast.ClassDef map over the whole reference package."""
    global _CLASS_MAP
    if _CLASS_MAP is None:
        _CLASS_MAP = {}
        for root, dirs, files in os.walk(REF):
            dirs[:] = [d for d in dirs if d not in ('tests', '__pycache__')]
            for fn in files:
                if fn.endswith('.py'):
                    with open(os.path.join(root, fn)) as f:
                        try:
                            tree = ast.parse(f.read())
                        except SyntaxError:
                            continue
                    for node in ast.walk(tree):
                        if isinstance(node, ast.ClassDef):
                            _CLASS_MAP.setdefault(node.name, node)
    return _CLASS_MAP


def _init_of(node):
    for meth in ('initialize', '__init__'):
        for item in node.body:
            if isinstance(item, ast.FunctionDef) and item.name == meth:
                a = item.args
                names = [x.arg for x in a.args[1:]] + [x.arg for x in a.kwonlyargs]
                return names, bool(a.kwarg)
    return None, None


def ref_kwargs(clsname, relpath):
    """Keyword names of the reference class's initialize (or __init__),
    following base classes by name across the package when inherited."""
    cmap = _class_map()
    seen = set()
    queue = [clsname]
    while queue:
        name = queue.pop(0)
        if name in seen or name not in cmap:
            continue
        seen.add(name)
        node = cmap[name]
        names, has_var = _init_of(node)
        if names is not None:
            return names, has_var
        for base in node.bases:
            if isinstance(base, ast.Name):
                queue.append(base.id)
            elif isinstance(base, ast.Attribute):
                queue.append(base.attr)
    return None, None


def our_kwargs(cls):
    """Keywords accepted by our class: union of __init__/initialize params,
    treating **kwargs as accept-all."""
    names = set()
    accept_all = False
    for meth in ('initialize', '__init__'):
        fn = getattr(cls, meth, None)
        if fn is None:
            continue
        try:
            sig = inspect.signature(fn)
        except (TypeError, ValueError):
            continue
        for p in sig.parameters.values():
            if p.kind is inspect.Parameter.VAR_KEYWORD:
                accept_all = True
            elif p.name not in ('self', 'args', 'kwargs'):
                names.add(p.name)
    return names, accept_all


def resolve(name):
    import importlib
    for mod in ('desilike_tpu', 'desilike_tpu.theories', 'desilike_tpu.observables',
                'desilike_tpu.likelihoods', 'desilike_tpu.samplers',
                'desilike_tpu.profilers', 'desilike_tpu.samples',
                'desilike_tpu.emulators', 'desilike_tpu.compat'):
        cls = getattr(importlib.import_module(mod), name, None)
        if cls is not None:
            return cls
    return None


def main():
    problems = 0
    for name, relpath in sorted(TARGETS.items()):
        refnames, _ = ref_kwargs(name, relpath)
        if refnames is None:
            print(f'?? {name}: no explicit initialize in reference (inherited) — skipped')
            continue
        cls = resolve(name)
        if cls is None:
            print(f'MISSING CLASS {name}')
            problems += 1
            continue
        ours, accept_all = our_kwargs(cls)
        if accept_all:
            continue
        missing = [n for n in refnames if n not in ours]
        if missing:
            problems += 1
            print(f'{name}: does not accept reference kwargs: {missing}')
    print(f'\n{problems} classes with kwarg gaps')
    return problems


if __name__ == '__main__':
    main()
