"""TNS (Taruya-Nishimichi-Saito 2010) RSD correction terms A and B.

Physics: arXiv:1006.0699 eqs. A3 (A term) and A4/B kernels (B term) — the
same published kernel polynomials any implementation computes (reference
full_shape.py:688-820 evaluates them with a python loop over mu nodes).

TPU-first structure: everything is built as dense (nk, nq, nmu) arrays on
STATIC quadrature grids and reduced with weighted sums in one shot — no
python-level mu loop, no dynamic shapes; the per-evaluation cost is a few
batched elementwise blocks + contractions that XLA fuses. The 1D 'a'
correction kernels (the F3-like pieces with log singularities) are
precomputed once at initialization in float64 numpy with their series
patches, so the traced program only contracts them against pk.
"""

from fractions import Fraction

import numpy as np
import jax.numpy as jnp


# --------------------------------------------------------------------------
# A-term 1D radial kernels (Taruya, Nishimichi & Saito 2010, arXiv:1006.0699
# eq. A3). Each has the closed form
#
#     a_m(x) = c_m x^{-p_m} [ 2 x D_m(x^2) + G_m(x^2) log|(x+1)/(x-1)| ]
#
# which suffers catastrophic cancellation between the rational and the log
# pieces as x -> 0 and x -> inf. Rather than hard-coding published Taylor
# coefficients, the patches are DERIVED here at import time by exact
# Fraction arithmetic from the same (c, p, D, G) data: substitute the series
# log|(x+1)/(x-1)| = 2 sum_j t^{2j+1}/(2j+1) with t = x (inner branch) or
# t = 1/x (outer branch), expand, and check that all singular powers cancel
# identically — the same generate-at-import scheme ops/spt.py uses for the
# P13 radial kernels.

def _poly_mul(a, b):
    out = {}
    for da, ca in a.items():
        for db, cb in b.items():
            out[da + db] = out.get(da + db, Fraction(0)) + ca * cb
    return out


def _u_poly(coeffs):
    """Polynomial in u = x^2, given ascending coefficients -> poly in x."""
    return {2 * i: Fraction(c) for i, c in enumerate(coeffs)}


def _u_poly_pow(coeffs, n):
    out = {0: Fraction(1)}
    base = _u_poly(coeffs)
    for _ in range(n):
        out = _poly_mul(out, base)
    return out


# (prefactor, inverse power p, D_m coefficients in u, G_m as poly in x)
_A_KERNEL_FORMS = (
    (Fraction(-1, 84), 1, (19, -24, 9), _poly_mul(_u_poly([-9]), _u_poly_pow((-1, 1), 3))),
    (Fraction(1, 112), 3, (3, -11, -11, 3), _poly_mul(_u_poly([-3]), _u_poly_pow((-1, 1), 4))),
    (Fraction(1, 336), 3, (9, -185, 159, -63), _poly_mul(_u_poly([9, 63]), _u_poly_pow((-1, 1), 3))),
    None,  # m=3 is identical to m=1
    (Fraction(1, 336), 3, (9, -109, 63, -27), _poly_mul(_u_poly([9, 27]), _u_poly_pow((-1, 1), 3))),
)


def _expand_a_kernel(c, p, D, G, branch, order=8):
    """Exact series of a_m around x=0 (branch=+1) or x=inf (branch=-1),
    as {power-of-x: float} with |power| <= order. Raises if any power that
    should cancel survives — a structural check on the closed forms."""
    # log|(x+1)/(x-1)| = 2 sum_{j>=0} t^(2j+1)/(2j+1), t = x or 1/x
    max_deg = max(G) + p + order + 2
    log_series = {branch * (2 * j + 1): Fraction(2, 2 * j + 1)
                  for j in range(max_deg // 2 + 1)}
    series = _poly_mul(G, log_series)
    direct = _poly_mul({1: Fraction(2)}, _u_poly(D))
    for deg, coeff in direct.items():
        series[deg] = series.get(deg, Fraction(0)) + coeff
    out = {}
    for deg, coeff in series.items():
        deg, coeff = deg - p, c * coeff
        if coeff == 0:
            continue
        if branch * deg > order:
            continue  # truncation tail
        if branch * deg < 0:
            raise AssertionError('singular x^{} survives in A-kernel series'.format(deg))
        out[deg] = float(coeff)
    return out


def _build_a_patches(order=8):
    inner, outer = [], []
    for form in _A_KERNEL_FORMS:
        if form is None:
            inner.append(None)
            outer.append(None)
            continue
        c, p, D, G = form
        inner.append(_expand_a_kernel(c, p, D, G, +1, order))
        outer.append(_expand_a_kernel(c, p, D, G, -1, order))
    return inner, outer


_A_PATCH_INNER, _A_PATCH_OUTER = _build_a_patches()


def _eval_patch(patch, x):
    out = np.zeros_like(x)
    for deg, coeff in patch.items():
        out += coeff * x ** deg
    return out


def a_correction_kernels(x, x_lo=0.05, x_hi=20.):
    """The five 1D radial kernels of the A-term correction
    (Taruya 2010 eq. A3, second piece ~ P(k) int dq kernel(q/k) P(q)).
    float64 numpy, static; the x^-2 jacobian factor is included.

    Outside [x_lo, x_hi] the closed form is replaced by the import-time
    series (see _expand_a_kernel): the rational and log pieces cancel like
    x^{2} relative (x^{-2} outer) against terms growing like x^{-p}, so the
    closed form is noise-dominated well before the kernels' small-x zeros —
    the cutoffs sit where both representations agree to ~1e-12 absolute.
    At x = 1 the log coefficient G_m has a (x^2-1)^3 zero, so masking the
    log there yields the exact limit 2 c_m D_m(1) — no bridging needed.

    Returns (5, *x.shape).
    """
    x = np.asarray(x, dtype='f8')
    with np.errstate(divide='ignore', invalid='ignore'):
        L = np.log(np.abs((x + 1.) / (x - 1.)))
    L = np.where(np.isfinite(L), L, 0.)
    lo, hi = x < x_lo, x > x_hi
    out = np.zeros((5,) + x.shape)
    for m, form in enumerate(_A_KERNEL_FORMS):
        if form is None:
            out[m] = out[1]
            continue
        c, p, D, G = form
        poly_d = sum(2. * float(d) * x ** (2 * i + 1) for i, d in enumerate(D))
        poly_g = sum(float(coeff) * x ** deg for deg, coeff in sorted(G.items()))
        with np.errstate(divide='ignore', invalid='ignore'):
            exact = float(c) * (poly_d + poly_g * L) / x ** p
        out[m] = np.where(lo, _eval_patch(_A_PATCH_INNER[m], x),
                          np.where(hi, _eval_patch(_A_PATCH_OUTER[m], x), exact))
    return out / x ** 2


class TNSCorrections:
    """A (5 components) and B (12 components) correction k-tables, plus the
    third-order-bias sigma3^2 table.

    Per-evaluation input is a traced pk callable; geometry (k, q, mu grids,
    weights, 1D a-kernels) is static and precomputed. Decomposition follows
    Taruya 2010: A(k, mu_los; f, b1) and B likewise are assembled downstream
    from these tables with the mu_los powers and f/b1 factors.
    """

    def __init__(self, k, qrange=(1e-4, 10.), nq=300, nmu=16):
        self.k = np.asarray(k, dtype='f8')
        # trapezoid in log q (pk spans decades); weights include q^2/(4 pi^2)
        q = np.geomspace(qrange[0], qrange[1], int(nq))
        lnq = np.log(q)
        wln = np.gradient(lnq)
        self.q = q
        self.jq = q ** 3 * wln / (4. * np.pi ** 2)   # q^2 dq -> q^3 dlnq
        xmu, wmu = np.polynomial.legendre.leggauss(int(nmu))
        self.mu = xmu
        self.wmu = wmu
        self.x = self.q[None, :] / self.k[:, None]           # (nk, nq)
        self._a_kern = a_correction_kernels(self.x)          # (5, nk, nq)
        # static geometry for the 2D piece
        x = self.x[:, :, None]                               # (nk, nq, 1)
        mu = xmu[None, None, :]                              # (1, 1, nmu)
        self.y2 = 1. + x ** 2 - 2. * x * mu                  # |k-q|^2 / k^2
        self._geom = (x, mu)

    def tables(self, pk_fn):
        """pk_fn: traced linear pk callable. Returns dict with
        'A' (5, nk), 'B' (12, nk), 'sig3sq' (nk,) (the latter to be
        multiplied by pk(k) downstream)."""
        k = jnp.asarray(self.k)
        q = jnp.asarray(self.q)
        jq = jnp.asarray(self.jq)
        wmu = jnp.asarray(self.wmu)
        x_np, mu_np = self._geom
        x = jnp.asarray(x_np)
        mu = jnp.asarray(mu_np)
        y2 = jnp.asarray(np.maximum(self.y2, 1e-12))

        pk_q = pk_fn(q)                                      # (nq,)
        pk_k = pk_fn(k)                                      # (nk,)
        y = k[:, None, None] * jnp.sqrt(y2)
        pk_y = pk_fn(y)                                      # (nk, nq, nmu)

        # --- A term (Taruya 2010 eq. A3): 2D piece ---
        # kernels A_m(x, mu) multiply pk(k); kernels tA_m multiply pk(q)
        mu2 = mu * mu
        kA = [
            -x ** 3 / 7. * (mu + 6. * mu ** 3 + x ** 2 * mu * (-3. + 10. * mu2) + x * (-3. + mu2 - 12. * mu2 ** 2)),
            x ** 4 / 14. * (mu2 - 1.) * (-1. + 7. * x * mu - 6. * mu2),
            x ** 3 / 14. * (x ** 2 * mu * (13. - 41. * mu2) - 4. * (mu + 6. * mu ** 3) + x * (5. + 9. * mu2 + 42. * mu2 ** 2)),
            None,  # = kA[1]
            x ** 3 / 14. * (1. - 7. * x * mu + 6. * mu2) * (-2. * mu + x * (-1. + 3. * mu2)),
        ]
        kA[3] = kA[1]
        ktA = [
            1. / 7. * (mu + x - 2. * x * mu2) * (3. * x + 7. * mu - 10. * x * mu2),
            x / 14. * (mu2 - 1.) * (3. * x + 7. * mu - 10. * x * mu2),
            1. / 14. * (28. * mu2 + x * mu * (25. - 81. * mu2) + x ** 2 * (1. - 27. * mu2 + 54. * mu2 ** 2)),
            x / 14. * (1. - mu2) * (x - 7. * mu + 6. * x * mu2),
            1. / 14. * (x - 7. * mu + 6. * x * mu2) * (-2. * mu - x + 3. * x * mu2),
        ]
        pref = jq[None, :, None] / x ** 2 * pk_y / y2 ** 2   # common weight, (nk, nq, nmu)
        A = jnp.stack([
            jnp.einsum('m,knm->k', wmu, pref * (ka * pk_k[:, None, None] + kta * pk_q[None, :, None]))
            for ka, kta in zip(kA, ktA)])
        # 1D correction piece: pk(k) * int dq a_m(q/k) pk(q)
        A = A + pk_k[None, :] * jnp.einsum('mkq,q,q->mk', jnp.asarray(self._a_kern), jnp.asarray(self.jq), pk_q)

        # --- B term (Taruya 2010 eq. A4 / B_n^{ab} kernels) ---
        xmu_ = y2                                            # |k-q|^2/k^2
        w = jq[None, :, None] * pk_q[None, :, None] * pk_y / (x ** 2 * xmu_)
        m2m1 = mu2 - 1.
        kB = [
            x ** 2 * m2m1 / 2.,
            3. * x ** 2 * m2m1 ** 2 / 8.,
            3. * x ** 4 * m2m1 ** 2 / xmu_ / 8.,
            5. * x ** 4 * m2m1 ** 3 / xmu_ / 16.,
            x * (x + 2. * mu - 3. * x * mu2) / 2.,
            -3. * x * m2m1 * (-x - 2. * mu + 5. * x * mu2) / 4.,
            3. * x ** 2 * m2m1 * (-2. + x ** 2 + 6. * x * mu - 5. * x ** 2 * mu2) / xmu_ / 4.,
            -3. * x ** 2 * m2m1 ** 2 * (6. - 5. * x ** 2 - 30. * x * mu + 35. * x ** 2 * mu2) / xmu_ / 16.,
            x * (4. * mu * (3. - 5. * mu2) + x * (3. - 30. * mu2 + 35. * mu2 ** 2)) / 8.,
            x * (-8. * mu + x * (-12. + 36. * mu2 + 12. * x * mu * (3. - 5. * mu2) + x ** 2 * (3. - 30. * mu2 + 35. * mu2 ** 2))) / xmu_ / 8.,
            3. * x * m2m1 * (-8. * mu + x * (-12. + 60. * mu2 + 20. * x * mu * (3. - 7. * mu2) + 5. * x ** 2 * (1. - 14. * mu2 + 21. * mu2 ** 2))) / xmu_ / 16.,
            x * (8. * mu * (-3. + 5. * mu2) - 6. * x * (3. - 30. * mu2 + 35. * mu2 ** 2) + 6. * x ** 2 * mu * (15. - 70. * mu2 + 63. * mu2 ** 2) + x ** 3 * (5. - 21. * mu2 * (5. - 15. * mu2 + 11. * mu2 ** 2))) / xmu_ / 16.,
        ]
        B = jnp.stack([jnp.einsum('m,knm->k', wmu, w * kb) for kb in kB])

        # --- sigma3^2 k-table (third-order bias; McDonald-Roy) ---
        # 105/16 int jq pk(q) (D S + 8/63), D = 2/7 (mu^2-1), S = (k.(k-q))^2/(q^2|k-q|^2) - 1/3
        # S = (q.(k-q))^2 / (q^2 |k-q|^2) - 1/3 with q.(k-q) = k^2 x (mu - x)
        # (the tidal kernel between q and k-q, NOT k and k-q)
        S = (mu - x) ** 2 / y2 - 1. / 3.
        D = 2. / 7. * (mu2 - 1.)
        sig3 = 105. / 16. * jnp.einsum('m,knm->k', wmu, jq[None, :, None] * pk_q[None, :, None] * (D * S + 8. / 63.))
        return {'A': A, 'B': B, 'sig3sq': sig3}
