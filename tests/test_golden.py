"""Golden physics vectors: every theory model's multipoles at pinned
parameters, frozen at round 2 (round-1 review item 6). Any drift beyond
float32 re-evaluation noise fails — refactors cannot silently change the
physics. Regenerate (deliberately) with the block at the bottom."""
import os

import numpy as np
import pytest

from desilike_tpu.core import Pipeline
from desilike_tpu.theories import (
    DampedBAOWigglesTracerPowerSpectrumMultipoles, SimpleBAOWigglesTracerPowerSpectrumMultipoles,
    ResummedBAOWigglesTracerPowerSpectrumMultipoles, FlexibleBAOWigglesTracerPowerSpectrumMultipoles,
    KaiserTracerPowerSpectrumMultipoles, EFTLikeKaiserTracerPowerSpectrumMultipoles,
    EPTTracerPowerSpectrumMultipoles, PNGTracerPowerSpectrumMultipoles,
    TreeLevelBispectrumMultipoles, BAOPowerSpectrumTemplate, ShapeFitPowerSpectrumTemplate,
    DampedBAOWigglesTracerCorrelationFunctionMultipoles)

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), 'data', 'golden_theories.npz'))
K = np.linspace(0.02, 0.3, 29)
VALUES = {'qpar': 1.02, 'qper': 0.98, 'b1': 1.8, 'sigmapar': 9., 'sigmaper': 6., 'sigmas': 2.,
          'dbeta': 1.1, 'df': 1.05, 'dm': 0.02, 'sn0': 500., 'ml0_0': 1., 'ml2_1': 0.5,
          'ct0_2': 10., 'ct2_2': 5., 'sn2': 20., 'fnl_loc': 10., 'p': 1.,
          'b2': 0.5, 'bs': -0.2, 'alpha0': 10., 'alpha2': 5., 'sigmav': 4.,
          # physical (DESI-2024) basis, round 5
          'b1p': 1.3, 'b2p': 0.5, 'bsp': -0.3, 'alpha0p': 1.5, 'alpha2p': -0.8,
          'sn0p': 0.6, 'sn2p': -0.2}


def build(name):
    if name == 'damped_bao':
        return DampedBAOWigglesTracerPowerSpectrumMultipoles(
            ells=(0, 2), k=K, template=BAOPowerSpectrumTemplate(z=0.8, apmode='qparqper')), 'power'
    if name == 'simple_bao':
        return SimpleBAOWigglesTracerPowerSpectrumMultipoles(
            ells=(0, 2), k=K, template=BAOPowerSpectrumTemplate(z=0.8)), 'power'
    if name == 'resummed_bao':
        return ResummedBAOWigglesTracerPowerSpectrumMultipoles(
            ells=(0, 2), k=K, template=BAOPowerSpectrumTemplate(z=0.8)), 'power'
    if name == 'flexible_bao':
        return FlexibleBAOWigglesTracerPowerSpectrumMultipoles(
            ells=(0, 2), k=K, template=BAOPowerSpectrumTemplate(z=0.8)), 'power'
    if name == 'kaiser':
        return KaiserTracerPowerSpectrumMultipoles(
            ells=(0, 2, 4), k=K, template=ShapeFitPowerSpectrumTemplate(z=0.8)), 'power'
    if name == 'eft_kaiser':
        return EFTLikeKaiserTracerPowerSpectrumMultipoles(
            ells=(0, 2), k=K, template=ShapeFitPowerSpectrumTemplate(z=0.8)), 'power'
    if name == 'png':
        return PNGTracerPowerSpectrumMultipoles(ells=(0, 2), k=K), 'power'
    if name == 'ept':
        # pinned at the round-2 physics (pre-IR-resummation path)
        return EPTTracerPowerSpectrumMultipoles(
            ells=(0, 2), k=K, template=ShapeFitPowerSpectrumTemplate(z=0.8),
            resum=None), 'power'
    if name == 'ept_resum':
        # round-4 default: IR-resummed 1-loop EPT
        return EPTTracerPowerSpectrumMultipoles(
            ells=(0, 2), k=K, template=ShapeFitPowerSpectrumTemplate(z=0.8)), 'power'
    if name == 'tns':
        from desilike_tpu.theories import TNSTracerPowerSpectrumMultipoles
        return TNSTracerPowerSpectrumMultipoles(
            ells=(0, 2), k=K, template=ShapeFitPowerSpectrumTemplate(z=0.8),
            loop_method='quadrature'), 'power'
    if name == 'damped_bao_xi':
        return DampedBAOWigglesTracerCorrelationFunctionMultipoles(
            ells=(0, 2), s=np.linspace(40., 140., 26), template=BAOPowerSpectrumTemplate(z=0.8)), 'corr'
    if name == 'bispectrum':
        return TreeLevelBispectrumMultipoles(template=ShapeFitPowerSpectrumTemplate(z=0.8)), 'bispectrum'
    if name == 'efttns_fftlog':
        from desilike_tpu.theories import EFTLikeTNSTracerPowerSpectrumMultipoles
        return EFTLikeTNSTracerPowerSpectrumMultipoles(
            ells=(0, 2), k=K, template=ShapeFitPowerSpectrumTemplate(z=0.8),
            loop_method='fftlog'), 'power'
    if name == 'ept_xi':
        from desilike_tpu.theories import EPTTracerCorrelationFunctionMultipoles
        return EPTTracerCorrelationFunctionMultipoles(
            ells=(0, 2), s=np.linspace(40., 140., 26),
            template=ShapeFitPowerSpectrumTemplate(z=0.8), resum=None), 'corr'
    if name == 'ept_xi_resum':
        from desilike_tpu.theories import EPTTracerCorrelationFunctionMultipoles
        return EPTTracerCorrelationFunctionMultipoles(
            ells=(0, 2), s=np.linspace(40., 140., 26),
            template=ShapeFitPowerSpectrumTemplate(z=0.8)), 'corr'
    if name == 'ept_physical':
        # round-5: DESI-2024 physical prior basis (LRG fsat/sigv presets)
        return EPTTracerPowerSpectrumMultipoles(
            ells=(0, 2), k=K, template=ShapeFitPowerSpectrumTemplate(z=0.8),
            prior_basis='physical', tracer='LRG'), 'power'
    if name == 'eh99_pk':
        from desilike_tpu.theories import DirectPowerSpectrumTemplate
        return DirectPowerSpectrumTemplate(z=0.8, k=K, engine='eh99'), 'pk_dd'
    raise KeyError(name)


FAST = ['damped_bao', 'simple_bao', 'resummed_bao', 'flexible_bao', 'kaiser',
        'eft_kaiser', 'png', 'damped_bao_xi', 'bispectrum', 'eh99_pk']
SLOW = ['ept', 'tns', 'efttns_fftlog', 'ept_xi', 'ept_resum', 'ept_xi_resum',
        'ept_physical']


@pytest.mark.parametrize('name', FAST)
def test_golden_vector(name):
    theory, attr = build(name)
    pipe = Pipeline(theory)
    allowed = set(pipe.params.basenames()) | set(pipe.params.names())
    pipe.evaluate({k: v for k, v in VALUES.items() if k in allowed})
    got = np.asarray(getattr(theory, attr), dtype='f8')
    ref = GOLDEN[name]
    scale = np.max(np.abs(ref))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale, rtol=2e-5,
                               err_msg='physics drift in {}'.format(name))


@pytest.mark.parametrize('name', SLOW)
def test_golden_vector_slow(name):
    test_golden_vector(name)


# Regeneration (deliberate physics change): run the generator snippet in
# the git history of tests/data/golden_theories.npz, or re-save via:
#   pipe.evaluate(values); np.savez('tests/data/golden_theories.npz', ...)
