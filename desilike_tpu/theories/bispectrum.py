"""Redshift-space galaxy bispectrum multipoles (tree-level + 1-loop pk input).

Counterpart of the reference's GeoFPT-AX wrapper
(full_shape.py:2523 ``GeoFPTAXTracerBispectrumMultipoles``): here the
bispectrum is computed in-framework from the Scoccimarro RSD kernels Z1/Z2
with quadratic biasing, orientation-averaged on static Gauss-Legendre
(theta, phi) grids — pure fused tensor math, differentiable.

Reference-parity features:
- ``(ell1, ell2, ell3)`` multipole labels in the Scoccimarro basis (one
  nonzero ell: Legendre in the LOS cosine of that side), matching the
  reference default ``((0,0,0), (2,0,0), (0,2,0), (0,0,2))``;
- Alcock-Paczynski remapping from the template's qpar/qper: the AP
  transform is the linear map diag(1/qper, 1/qper, 1/qpar) on wavevectors,
  so true side lengths and internal angles are computed exactly per
  orientation and the amplitude carries the 1/(qpar qper^2)^2 volume
  dilation (reference full_shape.py:2688-2691 A_B scaling);
- ``sigmav`` finger-of-god damping exp(-(k_par sigmav)^2/2 summed over
  sides) (reference's sigma_B counterterm, full_shape.py:2560);
- ``pt='1loop'``: the input power spectrum is upgraded to the 1-loop SPT
  matter pk, computed with the in-framework FFTLog-matrix engine
  (reference full_shape.py:2476-2521 ``pt_kernel``/``pt_pk_1loop`` does the
  same with a direct q-integral).
"""

import numpy as np
import jax.numpy as jnp

from ..core import Calculator
from .power_template import ShapeFitPowerSpectrumTemplate


def _legendre(ell, x):
    if ell == 0:
        return jnp.ones_like(x)
    if ell == 1:
        return x
    if ell == 2:
        return (3. * x ** 2 - 1.) / 2.
    if ell == 3:
        return (5. * x ** 3 - 3. * x) / 2.
    if ell == 4:
        return (35. * x ** 4 - 30. * x ** 2 + 3.) / 8.
    raise ValueError('bispectrum multipole ell={} not supported'.format(ell))


class TreeLevelBispectrumMultipoles(Calculator):
    r"""B_{l1 l2 l3} for a list of triangles (k1, k2, k3).

    B(k1, k2, k3; orientation) = 2 Z2(k1,k2) Z1(k1) Z1(k2) P(k1) P(k2) + cyc.
    with Z1 = b1 + f mu^2, Z2 the second-order RSD kernel with b2/bs2.
    Multipoles from averaging products of Legendre(mu_i) over orientations.

    Parameters
    ----------
    triangles : (ntri, 3) array, optional
        Triangle side lengths; equilateral grid by default.
    ells : tuple, default=(0,)
        Multipoles: ints (Legendre in mu1, i.e. (ell, 0, 0)) or 3-tuples
        (ell1, ell2, ell3) with a single nonzero entry.
    template : BasePowerSpectrumTemplate, optional
        Linear pk template; its qpar/qper drive the AP remapping.
    pt : str, optional
        None for linear input pk; '1loop' upgrades the input pk to the
        1-loop SPT matter power spectrum (FFTLog-matrix engine).
    """

    _state_attrs = ['bispectrum']

    _params = {
        'b1': dict(value=2., prior=dict(limits=[0., 4.]), ref=dict(dist='norm', loc=2., scale=0.1), latex='b_1'),
        'b2': dict(value=0., prior=dict(dist='norm', loc=0., scale=5.), latex='b_2'),
        'bs2': dict(value=0., prior=dict(dist='norm', loc=0., scale=5.), latex='b_{s2}'),
        'sigmav': dict(value=0., prior=dict(dist='norm', loc=0., scale=4.), latex=r'\sigma_{v,B}'),
        'snB': dict(value=0., prior=dict(dist='norm', loc=0., scale=5.), latex='s_{n,B}'),
    }

    def initialize(self, triangles=None, ells=(0,), template=None, ntheta=8, nphi=8,
                   shotnoise=1e4, pt=None, nk_loop=96):
        if triangles is None:
            k = np.linspace(0.02, 0.12, 6)
            triangles = [(k1, k1, k1) for k1 in k]  # equilateral by default
        self.triangles = np.asarray(triangles, dtype='f8')  # (ntri, 3)
        self.ells = tuple(ells)
        # normalize multipole labels to (ell1, ell2, ell3)
        self._ells3 = tuple((e, 0, 0) if not hasattr(e, '__len__') else tuple(e)
                            for e in self.ells)
        if template is None:
            template = ShapeFitPowerSpectrumTemplate()
        self.template = template
        kin = np.geomspace(1e-4, 1., 600)
        self.template.init.update(k=kin)
        self.nd = 1. / float(shotnoise)
        self.pt = pt
        if pt not in (None, '1loop'):
            raise ValueError("pt must be None or '1loop', got {!r}".format(pt))
        if pt == '1loop':
            # loop working grid: covers AP-shifted triangle sides
            from ..ops.spt_fftlog import FFTLogOneLoop
            from ..ops.chebyshev import ChebyshevLogInterp
            klo = max(self.triangles.min() * 0.6, 2. * kin[0])
            khi = min(self.triangles.max() * 1.7, 0.5 * kin[-1])
            self.k_work = np.geomspace(klo, khi, int(nk_loop))
            self.loop = FFTLogOneLoop(self.k_work)
            self._work_cheb = ChebyshevLogInterp(self.k_work, log_values=False)
        # orientation grids
        xg, wx = np.polynomial.legendre.leggauss(ntheta)
        self.ct = xg                       # cos(theta) of k1 w.r.t. line of sight
        self.wt = wx / 2.
        phi = (np.arange(nphi) + 0.5) * 2. * np.pi / nphi
        self.phi = phi
        self.wphi = np.full(nphi, 1. / nphi)
        # triangle internal cosines from closure: k3 = -(k1+k2)
        k1, k2, k3 = self.triangles.T
        self.mu12 = (k3 ** 2 - k1 ** 2 - k2 ** 2) / (2. * k1 * k2)
        self.mu13 = (k2 ** 2 - k1 ** 2 - k3 ** 2) / (2. * k1 * k3)
        self.mu23 = (k1 ** 2 - k2 ** 2 - k3 ** 2) / (2. * k2 * k3)

    @staticmethod
    def _F2(k1, k2, mu):
        return 5. / 7. + (mu / 2.) * (k1 / k2 + k2 / k1) + (2. / 7.) * mu ** 2

    @staticmethod
    def _G2(k1, k2, mu):
        return 3. / 7. + (mu / 2.) * (k1 / k2 + k2 / k1) + (4. / 7.) * mu ** 2

    def _Z2(self, k1, k2, mu12, mu1, mu2, f, b1, b2, bs2):
        k12mu = k1 * mu1 + k2 * mu2              # (k1+k2) . zhat
        F2 = self._F2(k1, k2, mu12)
        G2 = self._G2(k1, k2, mu12)
        S2 = mu12 ** 2 - 1. / 3.
        # mu_12 along LOS for the pair: (k1 mu1 + k2 mu2)/|k1+k2|
        k12 = jnp.sqrt(jnp.clip(k1 ** 2 + k2 ** 2 + 2. * k1 * k2 * mu12, 1e-30, None))
        mu12_los = k12mu / k12
        Z2 = (b1 * F2 + f * mu12_los ** 2 * G2
              + f * k12mu / 2. * (mu1 / k1 * (b1 + f * mu2 ** 2) + mu2 / k2 * (b1 + f * mu1 ** 2))
              + b2 / 2. + bs2 / 2. * S2)
        return Z2

    def _pk_evaluator(self):
        """Input-pk evaluator in true (AP-remapped) coordinates: linear
        template interpolation, or the 1-loop SPT matter pk when pt='1loop'
        (reference full_shape.py:2494-2521)."""
        lo = float(self.template.init['k'][0])
        hi = float(self.template.init['k'][-1])

        def pk_lin(kq):
            return self.template.pk_dd_interp(kq) * ((kq > lo) & (kq < hi))

        if self.pt != '1loop':
            return pk_lin
        t = self.loop.tables(pk_lin)
        pk1 = pk_lin(jnp.asarray(self.k_work)) + t['p22_dd'] + t['p13_dd']
        coeffs = self._work_cheb.coeffs(pk1)

        def pk_1loop(kq):
            kc = jnp.clip(kq, self.k_work[0], self.k_work[-1])
            return self._work_cheb.evaluate(coeffs, kc)
        return pk_1loop

    def calculate(self, b1=2., b2=0., bs2=0., sigmav=0., snB=0., **kw):
        f = self.template.f
        qpar = getattr(self.template, 'qpar', 1.)
        qper = getattr(self.template, 'qper', 1.)
        pk_fn = self._pk_evaluator()

        ks = [jnp.asarray(v)[:, None, None] for v in self.triangles.T]  # 3 x (ntri, 1, 1)
        # observed-space LOS cosines per orientation
        ct = jnp.asarray(self.ct)[:, None]          # (nt, 1)
        st = jnp.sqrt(jnp.clip(1. - ct ** 2, 0., None))
        cphi = jnp.cos(jnp.asarray(self.phi))[None, :]  # (1, np)
        mu12_b = jnp.asarray(self.mu12)[:, None, None]
        s12 = jnp.sqrt(jnp.clip(1. - mu12_b ** 2, 0., None))
        shape = (len(self.triangles), len(self.ct), len(self.phi))
        mu1 = jnp.broadcast_to(ct[None], shape)
        mu2 = mu12_b * ct[None] + s12 * st[None] * cphi[None]
        mu3 = -(ks[0] * mu1 + ks[1] * mu2) / ks[2]     # closure
        mus = [mu1, mu2, mu3]
        mu_pairs = {(0, 1): mu12_b,
                    (0, 2): jnp.asarray(self.mu13)[:, None, None],
                    (1, 2): jnp.asarray(self.mu23)[:, None, None]}

        # AP: wavevectors transform by diag(1/qper, 1/qper, 1/qpar), so true
        # side lengths / LOS cosines / pair cosines follow exactly from the
        # observed (k_i, mu_i, mu_ij) per orientation.
        kpar = [k * mu for k, mu in zip(ks, mus)]
        kt = [jnp.sqrt((k ** 2 - kp ** 2) / qper ** 2 + kp ** 2 / qpar ** 2)
              for k, kp in zip(ks, kpar)]
        mut = [kp / qpar / ktt for kp, ktt in zip(kpar, kt)]
        pkt = [pk_fn(ktt) for ktt in kt]

        def mu_pair_true(i, j):
            dot = (ks[i] * ks[j] * mu_pairs[(i, j)] - kpar[i] * kpar[j]) / qper ** 2 \
                + kpar[i] * kpar[j] / qpar ** 2
            return dot / (kt[i] * kt[j])

        def Z1(mu):
            return b1 + f * mu ** 2

        def term(i, j):
            Z2 = self._Z2(kt[i], kt[j], mu_pair_true(i, j), mut[i], mut[j], f, b1, b2, bs2)
            return 2. * Z2 * Z1(mut[i]) * Z1(mut[j]) * pkt[i] * pkt[j]

        B = term(0, 1) + term(0, 2) + term(1, 2)
        # finger-of-god damping on true k_par (reference sigmav counterterm)
        kpar2 = sum((kp / qpar) ** 2 for kp in kpar)
        B = B * jnp.exp(-0.5 * sigmav ** 2 * kpar2)
        # shot-noise term: snB * (P1 + P2 + P3)/nd (amplitude-varied)
        B = B + snB / self.nd * (pkt[0] + pkt[1] + pkt[2])
        # volume dilation: B scales with two powers of 1/(qpar qper^2)
        B = B / (qpar * qper ** 2) ** 2

        wt = jnp.asarray(self.wt)[None, :, None]
        wphi = jnp.asarray(self.wphi)[None, None, :]
        rows = []
        for ell3 in self._ells3:
            leg = 1.
            for ell, mu in zip(ell3, mus):
                if ell:
                    leg = leg * (2 * ell + 1) * _legendre(ell, mu)
            rows.append(jnp.sum(B * leg * wt * wphi, axis=(1, 2)))
        self.bispectrum = jnp.stack(rows)

    def get(self):
        return self.bispectrum
