"""Standard perturbation theory kernels and 1-loop integrals.

Design: the P13 radial kernels K_ab(r) are generated NUMERICALLY at
initialization from the SPT recursion relations (Bernardeau et al. 2002,
eqs. 43-45) with epsilon-regularization of the q2 -> -q1 configuration and
Richardson extrapolation — validated against the analytically-known
delta-delta kernel to ~1e-6. P22-type and quadratic-bias integrals use
direct (r, x) Gauss quadrature with F2/G2/S2 evaluated from their exact
vector forms, so nothing depends on hand-transcribed reduced formulas.

The per-evaluation path (in theories/ept.py) is pure elementwise +
contractions over static grids — TPU-friendly, differentiable.
"""

import numpy as np
import jax.numpy as jnp


# --- exact 2nd-order kernels in (r, x) variables: q1 = k r (angle x), q2 = k - q1 ---

def _rx_geometry(r, x):
    """y = |k - q|/k and mu12 = cos(q1, k-q1) for q1 = k r with cos(k,q1)=x."""
    y2 = 1. + r ** 2 - 2. * r * x
    y = jnp.sqrt(jnp.clip(y2, 1e-30, None))
    mu12 = (x - r) / y
    return y, mu12


def F2_rx(r, x):
    y, mu = _rx_geometry(r, x)
    return 5. / 7. + (mu / 2.) * (r / y + y / r) + (2. / 7.) * mu ** 2


def G2_rx(r, x):
    y, mu = _rx_geometry(r, x)
    return 3. / 7. + (mu / 2.) * (r / y + y / r) + (4. / 7.) * mu ** 2


def S2_rx(r, x):
    y, mu = _rx_geometry(r, x)
    return mu ** 2 - 1. / 3.


# --- P13 radial kernels from the SPT recursion (host-side numpy float64) ---

def _alpha(k1, k2):
    k12 = k1 + k2
    return np.einsum('...i,...i->...', k12, k1) / np.einsum('...i,...i->...', k1, k1)


def _beta(k1, k2):
    k12 = k1 + k2
    k12sq = np.einsum('...i,...i->...', k12, k12)
    dot = np.einsum('...i,...i->...', k1, k2)
    k1sq = np.einsum('...i,...i->...', k1, k1)
    k2sq = np.einsum('...i,...i->...', k2, k2)
    return k12sq * dot / (2. * k1sq * k2sq)


def _F2_vec(q1, q2):
    dot = np.einsum('...i,...i->...', q1, q2)
    q1sq = np.einsum('...i,...i->...', q1, q1)
    q2sq = np.einsum('...i,...i->...', q2, q2)
    mu2 = dot ** 2 / (q1sq * q2sq)
    return 5. / 7. + 0.5 * dot * (1. / q1sq + 1. / q2sq) + 2. / 7. * mu2


def _G2_vec(q1, q2):
    dot = np.einsum('...i,...i->...', q1, q2)
    q1sq = np.einsum('...i,...i->...', q1, q1)
    q2sq = np.einsum('...i,...i->...', q2, q2)
    mu2 = dot ** 2 / (q1sq * q2sq)
    return 3. / 7. + 0.5 * dot * (1. / q1sq + 1. / q2sq) + 4. / 7. * mu2


def _F3_G3_unsym(q1, q2, q3):
    """Unsymmetrized F3, G3 via the recursion (n=3)."""
    n = 3
    denom = (2 * n + 3) * (n - 1)  # 18
    F3 = 0.
    G3 = 0.
    # m = 1: G1(q1) * [ (2n+1) a(q1, q2+q3) F2(q2,q3) + 2 b G2(q2,q3) ]
    k1, k2 = q1, q2 + q3
    a, b = _alpha(k1, k2), _beta(k1, k2)
    F3 = F3 + (7. * a * _F2_vec(q2, q3) + 2. * b * _G2_vec(q2, q3)) / denom
    G3 = G3 + (3. * a * _F2_vec(q2, q3) + 6. * b * _G2_vec(q2, q3)) / denom
    # m = 2: G2(q1,q2) * [ (2n+1) a(q1+q2, q3) F1 + 2 b G1 ]
    k1, k2 = q1 + q2, q3
    a, b = _alpha(k1, k2), _beta(k1, k2)
    g2 = _G2_vec(q1, q2)
    F3 = F3 + g2 * (7. * a + 2. * b) / denom
    G3 = G3 + g2 * (3. * a + 6. * b) / denom
    return F3, G3


def _F3_G3_sym(q1, q2, q3):
    import itertools
    F3 = 0.
    G3 = 0.
    for perm in itertools.permutations((q1, q2, q3)):
        f, g = _F3_G3_unsym(*perm)
        F3 = F3 + f
        G3 = G3 + g
    return F3 / 6., G3 / 6.


def p13_radial_kernels(r, nx=200, eps=1e-3):
    r"""K_dd(r), K_dt(r), K_tt(r) such that

      P13_ab(k) = (k^3 P_ab^lin-ish(k) / (4 pi^2)) \int dr P(k r) K_ab(r)

    with the normalization P13_dd = 3 P(k) * (k^3/(2 pi^2)) \int r^2 dr P(kr)
    \int dx F3s(k, q, -q); the angle integral is done here. delta-theta uses
    (F3s + G3s) * 3/2 (cross gets both orderings), theta-theta uses 3 G3s.

    epsilon-regularized at q2 = -q1 (+ Richardson in eps).
    """
    r = np.asarray(r, dtype='f8')
    xg, wg = np.polynomial.legendre.leggauss(nx)

    def kernels(eps_val):
        # vectors: k = z-hat; q = r(sin, 0, cos); config (q, -q(1-eps), k - eps q)
        sin = np.sqrt(np.clip(1. - xg ** 2, 0., None))
        q = np.stack([r[:, None] * sin[None, :], np.zeros((r.size, nx)),
                      r[:, None] * xg[None, :]], axis=-1)       # (nr, nx, 3)
        k = np.zeros_like(q)
        k[..., 2] = 1.
        q1 = q
        q2 = -(1. - eps_val) * q
        q3 = k - q1 - q2
        F3, G3 = _F3_G3_sym(q1, q2, q3)
        Kdd = 3. * np.einsum('rx,x->r', F3, wg)
        Ktt = 3. * np.einsum('rx,x->r', G3, wg)
        Kdt = 1.5 * np.einsum('rx,x->r', F3 + G3, wg)
        return Kdd, Kdt, Ktt

    k1 = kernels(eps)
    k2 = kernels(eps / 2.)
    # Richardson: f(eps) = f0 + c eps -> f0 = 2 f(eps/2) - f(eps)
    return tuple(2. * b - a for a, b in zip(k1, k2))


def sigma3sq_radial_kernel(r, nmu=400):
    r"""Radial kernel of the third-order bias spectrum (McDonald & Roy 2009,
    arXiv:0902.0991; the b3nl sigma_3^2 term), with the reference's
    conventions (full_shape.py:771-781 qdkq/S/D and the positive-mu
    half-range average of utils.weights_mu):

      P_sig3sq(k) = (k^3 P(k) / (2 pi^2)) \int r^2 dr P(k r) K(r),
      K(r) = (105/16) (1/2) \int_{-1}^{1} dmu [ D(mu) S(r, mu) + 8/63 ],

    with D = (2/7)(mu^2 - 1) and the tidal kernel between the LOOP momenta
    S = S2(q, k - q) = (q.(k-q))^2/(q^2 |k-q|^2) - 1/3
      = (mu - r)^2/(1 - 2 r mu + r^2) - 1/3  at q = k r,
    mu integrated over the full sphere (the integrand is not even in mu;
    same full-range convention as ops/tns.py). The 8/63 constant cancels
    the UV (r -> inf) limit exactly, so the term carries no b1
    renormalization: K(inf) = 0; K(0) = 1."""
    r = np.asarray(r, dtype='f8')[:, None]
    mu, wmu = np.polynomial.legendre.leggauss(int(nmu))
    mu = mu[None, :]
    kq2 = np.clip(1. - 2. * r * mu + r ** 2, 1e-30, None)  # |k-q|^2 / k^2
    S = (mu - r) ** 2 / kq2 - 1. / 3.
    D = 2. / 7. * (mu ** 2 - 1.)
    integrand = D * S + 8. / 63.
    return (105. / 16.) * 0.5 * np.einsum('rm,m->r', integrand, wmu)


def p13_kernel_dd_analytic(r):
    """Known closed form of the delta-delta P13 radial kernel: with the
    normalization P13_dd = (k^3 P(k)/(2 pi^2)) int r^2 dr P(kr) K(r),
    K(r) = [12/r^2 - 158 + 100 r^2 - 42 r^4
            + (3/r^3)(r^2-1)^3 (7r^2+2) ln((1+r)/|1-r|)] / (504 r^2).
    Used to validate the recursion-generated kernels."""
    r = np.asarray(r, dtype='f8')
    with np.errstate(divide='ignore', invalid='ignore'):
        log = np.log(np.abs((1. + r) / (1. - r)))
        poly = (12. / r ** 2 - 158. + 100. * r ** 2 - 42. * r ** 4
                + 3. / r ** 3 * (r ** 2 - 1.) ** 3 * (7. * r ** 2 + 2.) * log)
        out = poly / (504. * r ** 2)
    out = np.where(np.abs(r - 1.) < 1e-8, (12. - 158. + 100. - 42.) / 504., out)
    return out


class OneLoopIntegrals:
    """Static quadrature engine for 1-loop EPT tables.

    Parameters
    ----------
    k_out : array
        Output wavenumbers (static).
    nr, nx : int
        Radial (log-spaced Gauss-Legendre in ln r) and angular quadrature sizes.
    rlim : (float, float)
        Integration range in r = q/k.
    """

    def __init__(self, k_out, nr=128, nx=64, rlim=(1e-4, 1e3)):
        self.k = np.asarray(k_out, dtype='f8')
        # log-r Gauss-Legendre
        xg, wg = np.polynomial.legendre.leggauss(nr)
        lnr = (np.log(rlim[1]) - np.log(rlim[0])) / 2. * (xg + 1.) + np.log(rlim[0])
        self.r = np.exp(lnr)                                      # (nr,)
        self.wr = wg * (np.log(rlim[1]) - np.log(rlim[0])) / 2. * self.r  # includes dr = r dlnr
        xg2, wx = np.polynomial.legendre.leggauss(nx)
        self.x = xg2
        self.wx = wx
        # P13 radial kernels (numerically generated + validated)
        Kdd, Kdt, Ktt = p13_radial_kernels(self.r)
        self.K13 = {'dd': Kdd, 'dt': Kdt, 'tt': Ktt}
        # static geometry for the (k_out, r, x) grid
        r_ = self.r[None, :, None]
        x_ = self.x[None, None, :]
        self.y = np.sqrt(np.clip(1. + r_ ** 2 - 2. * r_ * x_, 1e-30, None))  # (1, nr, nx)
        self.kq = self.k[:, None] * self.r[None, :]               # (nk, nr): |q|
        self.ky = self.k[:, None, None] * self.y                   # (nk, nr, nx): |k-q|
        # 2nd-order kernels on the grid (static f8)
        rr = np.broadcast_to(self.r[None, :, None], self.y.shape)
        xx = np.broadcast_to(self.x[None, None, :], self.y.shape)
        mu12 = (xx - rr) / self.y
        self.F2 = 5. / 7. + (mu12 / 2.) * (rr / self.y + self.y / rr) + (2. / 7.) * mu12 ** 2
        self.G2 = 3. / 7. + (mu12 / 2.) * (rr / self.y + self.y / rr) + (4. / 7.) * mu12 ** 2
        self.S2 = mu12 ** 2 - 1. / 3.

    def tables(self, pk_fn):
        """Compute all 1-loop tables on self.k given a traced pk evaluator.

        pk_fn : callable k-array -> P_lin(k) (jit-safe, e.g. template Chebyshev)

        Normalizations (q = k r, y = |k-q|/k):
          P22_ab(k)  = (k^3/(2 pi^2)) int r^2 dr P(kr) int dx K_a K_b P(ky)
          Pb2_a(k)   = same with single kernel, / 2
          P13_ab(k)  = (k^3/(2 pi^2)) P(k) int r^2 dr P(kr) K13_ab(r)
          Pb22(k)    = (k^3/(8 pi^2)) int r^2 dr P(kr) int dx [P(ky) - P(kr)]
          Pb2s2(k)   = (k^3/(8 pi^2)) int ... [S2 P(ky) - (2/3) P(kr)]
          Pbs22(k)   = (k^3/(8 pi^2)) int ... [S2^2 P(ky) - (4/9) P(kr)]
        """
        k = jnp.asarray(self.k)
        pk_k = pk_fn(k)                         # (nk,)
        pk_q = pk_fn(jnp.asarray(self.kq))      # (nk, nr)
        pk_y = pk_fn(jnp.asarray(self.ky))      # (nk, nr, nx)

        wr = jnp.asarray(self.wr)
        wx = jnp.asarray(self.wx)
        r2 = jnp.asarray(self.r ** 2)
        pref = k ** 3 / (2. * np.pi ** 2)
        wr2 = r2 * wr                            # r^2 dr weights

        def quad(kernel):
            inner = jnp.einsum('knx,x->kn', pk_y * jnp.asarray(kernel), wx)
            return pref * jnp.einsum('kn,n->k', pk_q * inner, wr2)

        def quad_sub(kernel_y, const_sub):
            """int dx [kernel * P(ky) - const_sub * P(kr)] with the full dx measure."""
            inner = jnp.einsum('knx,x->kn', pk_y * jnp.asarray(kernel_y), wx) \
                - 2. * const_sub * pk_q
            return pref / 4. * jnp.einsum('kn,n->k', pk_q * inner, wr2)

        tables = {}
        tables['p22_dd'] = quad(self.F2 ** 2)
        tables['p22_dt'] = quad(self.F2 * self.G2)
        tables['p22_tt'] = quad(self.G2 ** 2)
        # quadratic bias spectra (McDonald & Roy 2009 basis; low-k constants
        # subtracted so they are absorbed by shot noise)
        tables['pb2_d'] = quad(self.F2) / 2.
        tables['pb2_t'] = quad(self.G2) / 2.
        tables['pbs2_d'] = quad(self.F2 * self.S2) / 2.
        tables['pbs2_t'] = quad(self.G2 * self.S2) / 2.
        tables['pb22'] = quad_sub(np.ones_like(self.S2), 1.)
        tables['pb2s2'] = quad_sub(self.S2, 2. / 3.)
        tables['pbs22'] = quad_sub(self.S2 ** 2, 4. / 9.)
        # P13 via the recursion-generated radial kernels
        for ab in ('dd', 'dt', 'tt'):
            K = jnp.asarray(self.K13[ab])
            tables['p13_' + ab] = pref * pk_k * jnp.einsum('kn,n->k', pk_q, K * wr2)
        # third-order bias (b3nl sigma_3^2 P_lin) term — same radial form
        Ksig3 = jnp.asarray(sigma3sq_radial_kernel(self.r))
        tables['p_sig3sq'] = pref * pk_k * jnp.einsum('kn,n->k', pk_q, Ksig3 * wr2)
        # velocity dispersion sigma_v^2 = (1/6 pi^2) int P(q) dq on a static grid
        qs = np.geomspace(1e-4, 20., 256)
        wq = np.zeros_like(qs)
        dq = np.diff(qs)
        wq[:-1] += dq / 2.
        wq[1:] += dq / 2.
        tables['sigma_v2'] = jnp.sum(jnp.asarray(wq) * pk_fn(jnp.asarray(qs))) / (6. * np.pi ** 2)
        return tables
