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

import numpy as np
import jax.numpy as jnp


def _log_ratio(x):
    """log|(x+1)/(x-1)| with the x=1 singularity masked (series-patched later)."""
    with np.errstate(divide='ignore', invalid='ignore'):
        out = np.log(np.abs((x + 1.) / (x - 1.)))
    return np.where(np.isfinite(out), out, 0.)


def a_correction_kernels(x):
    """The five 1D radial kernels of the A-term correction
    (Taruya 2010 eq. A3, second piece ~ P(k) int dq kernel(q/k) P(q)),
    with Taylor patches at x -> 1, x -> 0, x -> inf. float64 numpy, static.

    Returns (5, *x.shape); the x^-2 jacobian factor is included.
    """
    x = np.asarray(x, dtype='f8')
    L = _log_ratio(x)
    out = np.zeros((5,) + x.shape)
    x2 = x * x
    out[0] = -1. / 84. / x * (2. * x * (19. - 24. * x2 + 9. * x2 ** 2) - 9. * (x2 - 1.) ** 3 * L)
    out[1] = 1. / 112. / x ** 3 * (2. * x * (x2 + 1.) * (3. - 14. * x2 + 3. * x2 ** 2) - 3. * (x2 - 1.) ** 4 * L)
    out[2] = 1. / 336. / x ** 3 * (2. * x * (9. - 185. * x2 + 159. * x2 ** 2 - 63. * x2 ** 3) + 9. * (x2 - 1.) ** 3 * (7. * x2 + 1.) * L)
    out[4] = 1. / 336. / x ** 3 * (2. * x * (9. - 109. * x2 + 63. * x2 ** 2 - 27. * x2 ** 3) + 9. * (x2 - 1.) ** 3 * (3. * x2 + 1.) * L)

    # series patches (same expansions as published)
    lo = x < 1e-4
    xl = x[lo]
    out[0][lo] = 8. * xl ** 8 / 735 + 24. * xl ** 6 / 245 - 24. * xl ** 4 / 35 + 8. * xl ** 2 / 7 - 2. / 3
    out[1][lo] = -16. * xl ** 8 / 8085 - 16. * xl ** 6 / 735 + 48. * xl ** 4 / 245 - 16. * xl ** 2 / 35
    out[2][lo] = 32. * xl ** 8 / 1617 + 128. * xl ** 6 / 735 - 288. * xl ** 4 / 245 + 64. * xl ** 2 / 35 - 4. / 3
    out[4][lo] = 24. * xl ** 8 / 2695 + 8. * xl ** 6 / 105 - 24. * xl ** 4 / 49 + 24. * xl ** 2 / 35 - 2. / 3
    hi = x > 1e2
    xh = x[hi]
    out[0][hi] = 2. / 105 - 24. / (245 * xh ** 2) - 8. / (735 * xh ** 4) - 8. / (2695 * xh ** 6) - 8. / (7007 * xh ** 8)
    out[1][hi] = -16. / 35 + 48. / (245 * xh ** 2) - 16. / (735 * xh ** 4) - 16. / (8085 * xh ** 6) - 16. / (35035 * xh ** 8)
    out[2][hi] = -44. / 105 - 32. / (735 * xh ** 4) - 64. / (8085 * xh ** 6) - 96. / (35035 * xh ** 8)
    out[4][hi] = -46. / 105 + 24. / (245 * xh ** 2) - 8. / (245 * xh ** 4) - 8. / (1617 * xh ** 6) - 8. / (5005 * xh ** 8)
    # near x=1: the exact expression is finite; bridge the log-masked window
    near = np.abs(x - 1.) < 1e-6
    if near.any():
        eps = 1e-4
        out[:, near] = 0.5 * (a_correction_kernels(x[near] + eps) + a_correction_kernels(x[near] - eps))[:, :]
    out[3] = out[1]
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
