"""Parameter-name parity audit: compare each reference class's YAML-declared
parameter basenames (theories/galaxy_clustering/*.yaml etc.) with the
basenames our same-named class actually declares after initialization.

A reference user's `likelihood(sigmapar=..., al0_0=...)` call must resolve;
any YAML basename without a counterpart here is a migration break (templated
names like `al[:,:3]` or wildcard towers are expanded structurally and
checked by prefix).

Usage: python scripts/param_audit.py
"""
import glob
import os
import re
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = '/root/reference/desilike'

YAMLS = glob.glob(os.path.join(REF, 'theories', '**', '*.yaml'), recursive=True) + \
    glob.glob(os.path.join(REF, 'observables', '**', '*.yaml'), recursive=True) + \
    glob.glob(os.path.join(REF, 'likelihoods', '**', '*.yaml'), recursive=True)

# Classes whose parameterization is deliberately different here (documented
# in docs/migration.md / compat.py) — skipped rather than reported.
SKIP_CLASSES = {
    # external PT-code wrappers map to the in-framework EPT model whose
    # nuisance tower is the EPT one (compat.py documents the mapping)
    'LPTVelocileptorsTracerPowerSpectrumMultipoles',
    'LPTVelocileptorsTracerCorrelationFunctionMultipoles',
    'REPTVelocileptorsTracerPowerSpectrumMultipoles',
    'REPTVelocileptorsTracerCorrelationFunctionMultipoles',
    'PyBirdTracerPowerSpectrumMultipoles', 'PyBirdTracerCorrelationFunctionMultipoles',
    'FOLPSTracerPowerSpectrumMultipoles', 'FOLPSTracerCorrelationFunctionMultipoles',
    'FOLPSAXTracerPowerSpectrumMultipoles', 'FOLPSAXTracerCorrelationFunctionMultipoles',
    'GeoFPTAXTracerBispectrumMultipoles', 'JAXEffortTracerPowerSpectrumMultipoles',
    'DESY3Theory', 'DESY3Observable',  # cosmosis-gated host wrapper
}

# Accepted, documented differences (docs/migration.md): the reference
# extractors DECLARE cosmology params like Omega_m/N_eff/w0_fld/wa_fld in
# their YAML; here the Cosmology node declares the CLASS-basis params and
# accepts the alternative names when the user declares them in init.params
# (theories/cosmology.py calculate converts). Declaring Omega_m by default
# would silently override omega_cdm for every pipeline — a footgun the
# explicit declaration avoids. APEffect declares its q-params per `mode=`,
# not the union of all modes.
ACCEPTED = {
    'BAOExtractor': {'Omega_m'},
    'BAOPhaseShiftExtractor': {'Omega_m', 'N_eff'},
    'StandardPowerSpectrumExtractor': {'Omega_m', 'N_eff', 'w0_fld', 'wa_fld'},
    'ShapeFitPowerSpectrumExtractor': {'Omega_m', 'N_eff', 'w0_fld', 'wa_fld'},
    'WiggleSplitPowerSpectrumExtractor': {'Omega_m', 'N_eff', 'w0_fld', 'wa_fld'},
    'TurnOverPowerSpectrumExtractor': {'Omega_m'},
    'P1DPowerSpectrumExtractor': {'alpha_s', 'w0_fld', 'wa_fld'},
    'APEffect': {'qap', 'qiso', 'qpar', 'qper'},
    # mode-conditional parameter pruning, same rule as the reference's
    # keep_params (ref primordial_non_gaussianity.py:58-66): the default
    # mode 'b-p' drops bphi/bfnl_loc; 'bphi'/'bfnl' modes declare them
    'PNGTracerPowerSpectrumMultipoles': {'bphi', 'bfnl_loc'},
    'PNGTracerVelocityPowerSpectrumMultipoles': {'bphi', 'bfnl_loc'},
    # apmode-conditional q-params (the union appears in the reference YAML,
    # pruned per apmode there too); theta_MC_100 needs Cosmology(theta=True)
    'BAOPowerSpectrumTemplate': {'qap', 'qiso'},
    'BAOPhaseShiftPowerSpectrumTemplate': {'qap', 'qiso'},
    'StandardPowerSpectrumTemplate': {'qap', 'qiso'},
    'ShapeFitPowerSpectrumTemplate': {'qap', 'qiso'},
    'Cosmoprimo': {'N_eff', 'w0_fld', 'wa_fld', 'theta_MC_100'},
    'DirectPowerSpectrumTemplate': {'N_eff', 'w0_fld', 'wa_fld'},
    'DirectWiggleSplitPowerSpectrumTemplate': {'N_eff', 'Omega_m', 'w0_fld', 'wa_fld'},
}


def load_docs(path):
    txt = open(path).read()
    txt = re.sub(r"e'[^']*'", "'EXPR'", txt)
    docs = []
    for chunk in txt.split('\n---'):
        try:
            doc = yaml.safe_load(chunk)
        except Exception:
            doc = None
        if isinstance(doc, dict):
            docs.append(doc)
    return docs


def base_of(name):
    """Structural basename of a YAML param key: strip namespace templates and
    index templates (`al[:,:3]` -> 'al', `qpar` -> 'qpar')."""
    name = name.split('.')[-1]
    return re.split(r'[\[\*]', name)[0].rstrip('_')


def resolve(name):
    import importlib
    for mod in ('desilike_tpu.theories', 'desilike_tpu.observables',
                'desilike_tpu.likelihoods', 'desilike_tpu.likelihoods.cmb',
                'desilike_tpu.likelihoods.supernovae', 'desilike_tpu.compat',
                'desilike_tpu'):
        cls = getattr(importlib.import_module(mod), name, None)
        if cls is not None:
            return cls
    return None


def our_basenames(cls):
    try:
        obj = cls()
        obj.pipeline  # force initialization
        params = obj.pipeline.params
    except Exception as exc:
        return None, exc
    names = set()
    for p in params:
        names.add(re.split(r'\d', p.basename)[0].rstrip('_') or p.basename)
        names.add(p.basename)
    return names, None


def main():
    problems = 0
    seen = set()
    for path in YAMLS:
        for doc in load_docs(path):
            clsname = doc.get('class')
            params = doc.get('params') or {}
            if not clsname or not params or clsname in seen:
                continue
            seen.add(clsname)
            if clsname in SKIP_CLASSES:
                continue
            cls = resolve(clsname)
            if cls is None:
                print(f'MISSING CLASS {clsname} ({os.path.basename(path)})')
                problems += 1
                continue
            ours, err = our_basenames(cls)
            if ours is None:
                print(f'?? {clsname}: could not default-construct ({type(err).__name__}: {err})')
                continue
            missing = sorted({base_of(k) for k in params} - ours - ACCEPTED.get(clsname, set()))
            if missing:
                problems += 1
                print(f'{clsname}: missing param basenames {missing}')
    print(f'\n{problems} classes with param-name gaps ({len(seen)} audited)')
    return problems


if __name__ == '__main__':
    main()
