import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desilike_tpu.theories import PNGTracerPowerSpectrumMultipoles, ShapeFitPowerSpectrumTemplate
from desilike_tpu.theories.bispectrum import TreeLevelBispectrumMultipoles
from desilike_tpu.observables import TracerBispectrumMultipolesObservable
from desilike_tpu.likelihoods import ObservablesGaussianLikelihood


def test_png_scale_dependent_bias():
    theory = PNGTracerPowerSpectrumMultipoles(
        k=np.linspace(0.003, 0.1, 30), ells=(0,),
        template=ShapeFitPowerSpectrumTemplate(z=1.))
    pipe = theory.pipeline
    p0 = np.asarray(pipe.evaluate({'fnl_loc': 0., 'b1': 2.}))[0]
    p1 = np.asarray(pipe.evaluate({'fnl_loc': 50., 'b1': 2.}))[0]
    ratio = p1 / p0
    # scale-dependent: enhancement grows to low k (1/k^2 T)
    assert ratio[0] > ratio[-1] > 1.0
    assert ratio[0] > 1.05
    # differentiable in fnl
    fn = pipe.get_fn()
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    g = jax.grad(lambda v: jnp.sum(fn(v)[0]))(vals)
    assert np.isfinite(float(g['fnl_loc']))


def test_tree_bispectrum():
    k = np.linspace(0.02, 0.1, 5)
    theory = TreeLevelBispectrumMultipoles(
        triangles=[(kk, kk, kk) for kk in k], ells=(0, 2),
        template=ShapeFitPowerSpectrumTemplate(z=1.))
    B = np.asarray(theory.pipeline.evaluate({'b1': 2.}))
    assert B.shape == (2, 5)
    assert np.all(B[0] > 0)          # equilateral monopole positive
    assert np.all(np.diff(B[0]) < 0)  # decreasing with k
    # b2 increases the bispectrum amplitude
    B2 = np.asarray(theory.pipeline.evaluate({'b1': 2., 'b2': 1.}))
    assert np.all(B2[0] > B[0])


def test_bispectrum_observable_likelihood():
    k = np.linspace(0.02, 0.1, 5)
    obs = TracerBispectrumMultipolesObservable(
        data={'b1': 2.0}, triangles=[(kk, kk, kk) for kk in k], ells=(0,))
    obs.runtime_info.initialize()
    cov = np.diag((0.05 * np.abs(obs.flatdata)) ** 2)
    like = ObservablesGaussianLikelihood(observables=[obs], covariance=cov)
    fn = like.logpost_fn()
    pipe = like.pipeline
    vals = {p.name: jnp.asarray(p.value) for p in pipe.varied_params}
    vals['b1'] = jnp.asarray(2.0)
    lp0, _ = fn(vals)
    lp1, _ = fn({**vals, 'b1': jnp.asarray(2.2)})
    assert np.isfinite(float(lp0)) and float(lp1) < float(lp0)


def test_bispectrum_ap_isotropic_dilation():
    """Isotropic AP: B_obs(k; qiso=q) = B_true(k/q) / q^6 exactly (the AP
    map is diag(1/q) on wavevectors and the amplitude carries two powers of
    the 1/q^3 volume dilation)."""
    from desilike_tpu.theories import StandardPowerSpectrumTemplate
    q = 1.04
    tri = np.array([(0.04, 0.06, 0.09), (0.08, 0.08, 0.08)])
    kw = dict(ells=(0, 2), ntheta=6, nphi=6)
    th_ap = TreeLevelBispectrumMultipoles(
        triangles=tri, template=StandardPowerSpectrumTemplate(z=1.), **kw)
    th_ref = TreeLevelBispectrumMultipoles(
        triangles=tri / q, template=StandardPowerSpectrumTemplate(z=1.), **kw)
    vals = dict(b1=2., b2=0.3, bs2=0.1, sigmav=2., df=1.)
    B_ap = np.asarray(th_ap.pipeline.evaluate({**vals, 'qpar': q, 'qper': q}))
    B_ref = np.asarray(th_ref.pipeline.evaluate({**vals, 'qpar': 1., 'qper': 1.}))
    np.testing.assert_allclose(B_ap, B_ref / q ** 6, rtol=3e-6)  # f32 outputs


def test_bispectrum_multipole_labels_and_fog():
    """(ell1,ell2,ell3) labels: (0,0,0) == legacy 0; for a scalene triangle
    the quadrupole differs by which side carries the Legendre weight; sigmav
    damps the amplitude."""
    tri = np.array([(0.05, 0.08, 0.11)])
    theory = TreeLevelBispectrumMultipoles(
        triangles=tri, ells=(0, (0, 0, 0), (2, 0, 0), (0, 0, 2)),
        template=ShapeFitPowerSpectrumTemplate(z=1.), ntheta=6, nphi=6)
    B = np.asarray(theory.pipeline.evaluate({'b1': 2.}))
    np.testing.assert_allclose(B[0], B[1], rtol=1e-12)   # int == (ell,0,0)
    assert not np.allclose(B[2], B[3], rtol=1e-3)        # different sides
    Bd = np.asarray(theory.pipeline.evaluate({'b1': 2., 'sigmav': 4.}))
    assert np.all(np.abs(Bd[0]) < np.abs(B[0]))


def test_bispectrum_1loop_input_pk():
    """pt='1loop' upgrades the input pk: small shift on large scales,
    growing with k (reference full_shape.py:2494-2521 pt_pk_1loop)."""
    ktri = np.array([0.03, 0.08, 0.15])
    tri = [(kk, kk, kk) for kk in ktri]
    kw = dict(ells=(0,), ntheta=6, nphi=6)
    th_lin = TreeLevelBispectrumMultipoles(
        triangles=tri, template=ShapeFitPowerSpectrumTemplate(z=1.), **kw)
    th_loop = TreeLevelBispectrumMultipoles(
        triangles=tri, template=ShapeFitPowerSpectrumTemplate(z=1.), pt='1loop', **kw)
    B_lin = np.asarray(th_lin.pipeline.evaluate({'b1': 2.}))[0]
    B_loop = np.asarray(th_loop.pipeline.evaluate({'b1': 2.}))[0]
    rel = np.abs(B_loop / B_lin - 1.)
    assert rel[0] < 0.05            # loop correction small on large scales
    assert rel[-1] > rel[0]         # and grows toward smaller scales
    assert np.all(rel < 0.8)        # but stays a correction, not a blow-up
