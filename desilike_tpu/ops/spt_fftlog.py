"""FFTLog-matrix evaluation of the 1-loop SPT integrals.

Method (Simonovic et al. 2017 structure; PAPERS.md 1603.04405 class): the
linear pk is decomposed as P(x) = sum_m c_m x^{nu + i eta_m} on a log grid;
every P22-type integral then factorizes as

  P22_K(k) = sum_{m1,m2} c_{m1} c_{m2} k^{3 + nu_{m1} + nu_{m2}} M_K(m1, m2)

with kernel matrices M_K = (1/2 pi^2) int r^{2+nu1} dr int dx K(r, x) y^{nu2}
that are INDEPENDENT of pk and k. Instead of transcribing the analytic
gamma-function continuations, the matrices are computed once, numerically,
with the same (r, x) quadrature validated in ops/spt.py — and the whole
path is validated against the direct quadrature on a realistic pk in tests.

Per-evaluation cost: one FFT of the pk samples + per-k complex quadratic
forms (nk x N^2 MACs) — an MXU matmul, ~50-100x cheaper than the direct
quadrature's per-eval Chebyshev sweeps.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .spt import OneLoopIntegrals, p13_radial_kernels


class FFTLogOneLoop:
    """1-loop EPT tables via FFTLog decomposition + precomputed matrices.

    Parameters
    ----------
    k_out : array
        Output wavenumbers.
    krange : (float, float)
        Decomposition range (log-uniform); pk is treated as zero outside.
    nfft : int
        Number of log-grid samples (nfft//2+1 frequencies).
    bias : float
        Power-law bias nu of the decomposition.
    nr, nx : int
        Quadrature orders for the (one-time) kernel-matrix integrals.
    """

    def __init__(self, k_out, krange=(5e-5, 1e2), nfft=128, bias=-0.6, bias_b22=-1.7,
                 nr=256, nx=96, rlim=(1e-4, 1e3)):
        self.k = np.asarray(k_out, dtype='f8')
        self.nfft = int(nfft)
        self.bias = float(bias)
        self.bias_b22 = float(bias_b22)  # constant-kernel (b22-type) integrals
        # need a steeper bias for large-r convergence of the matrix integrals
        k0, k1 = krange
        self.x_grid = np.geomspace(k0, k1, self.nfft)
        delta = np.log(k1 / k0) / (self.nfft - 1)
        self.delta = delta
        m = np.arange(self.nfft // 2 + 1)
        self.eta = 2. * np.pi * m / (self.nfft * delta)
        # full-spectrum frequencies (negative via conjugation at use time)
        # quadrature grids (log-r GL + GL in x), same construction as spt.py
        xg, wg = np.polynomial.legendre.leggauss(nr)
        lnr = (np.log(rlim[1]) - np.log(rlim[0])) / 2. * (xg + 1.) + np.log(rlim[0])
        r = np.exp(lnr)
        wr = wg * (np.log(rlim[1]) - np.log(rlim[0])) / 2. * r
        xg2, wx = np.polynomial.legendre.leggauss(nx)
        y = np.sqrt(np.clip(1. + r[:, None] ** 2 - 2. * r[:, None] * xg2[None, :], 1e-30, None))
        mu12 = (xg2[None, :] - r[:, None]) / y
        F2 = 5. / 7. + (mu12 / 2.) * (r[:, None] / y + y / r[:, None]) + (2. / 7.) * mu12 ** 2
        G2 = 3. / 7. + (mu12 / 2.) * (r[:, None] / y + y / r[:, None]) + (4. / 7.) * mu12 ** 2
        S2 = mu12 ** 2 - 1. / 3.
        kernels = {'p22_dd': F2 ** 2, 'p22_dt': F2 * G2, 'p22_tt': G2 ** 2,
                   'pb2_d': F2 / 2., 'pb2_t': G2 / 2.,
                   'pbs2_d': F2 * S2 / 2., 'pbs2_t': G2 * S2 / 2.}
        kernels_b22 = {'pb22_y': np.ones_like(S2) / 4., 'pb2s2_y': S2 / 4.,
                       'pbs22_y': S2 ** 2 / 4.}
        # complex exponents nu_m = bias + i eta_m, full spectrum indexing
        lny = np.log(y)

        def build_matrices(bias, kernel_dict):
            nu = bias + 1j * self._full_eta()
            nfreq = len(nu)
            r_pow_w = np.exp(np.outer(lnr, (2. + nu))) * wr[:, None]  # (nr, nfreq)
            out = {}
            for name, K in kernel_dict.items():
                Mk = np.empty((nfreq, nfreq), dtype=complex)
                for j2 in range(nfreq):
                    ypow = np.exp(nu[j2] * lny)                       # (nr, nx)
                    inner = np.einsum('rx,x->r', K * ypow, wx)        # (nr,)
                    Mk[:, j2] = np.einsum('rm,r->m', r_pow_w, inner)
                out[name] = Mk / (2. * np.pi ** 2)
            return nu, r_pow_w, out

        nu, r_pow_w, self.M = build_matrices(self.bias, kernels)
        self._nu_b22, _, self.M_b22 = build_matrices(self.bias_b22, kernels_b22)

        # Real half-spectrum reformulation of the quadratic forms: for a real
        # pk the full-spectrum coefficients are Hermitian (d_{-m} = conj(d_m)),
        # so with u = [Re d_h, Im d_h] (h = 0..N/2) the form d^T M d has
        # Re(d^T M d) = u^T Re(S^T M S) u with S the fixed (N, N+2) complex
        # map d_full = S u. Per-eval this is ONE real (stacked) matmul on the
        # MXU instead of complex arithmetic over the full spectrum: 4x fewer
        # real MACs and native-dtype matmuls.
        def real_form(M_dict, nu_full):
            N = self.nfft
            half = N // 2
            freqs = np.fft.fftfreq(N, d=1. / N).astype(int)  # integer frequencies
            nreal = 2 * (half + 1)
            S = np.zeros((N, nreal), dtype=complex)
            for p, f in enumerate(freqs):
                h = abs(f)
                sgn = -1. if f < 0 else 1.
                S[p, h] = 1.                     # a_h = Re d_h
                S[p, half + 1 + h] = 1j * sgn    # b_h = Im d_h
            names = list(M_dict)
            Mr = np.stack([np.real(S.T @ M_dict[name] @ S) for name in names])
            return names, Mr

        self._names_M, self._Mr = real_form(self.M, nu)
        self._names_b22, self._Mr_b22 = real_form(self.M_b22, self._nu_b22)
        half = self.nfft // 2
        self._nu_half = self.bias + 1j * 2. * np.pi * np.arange(half + 1) / (self.nfft * self.delta)
        self._nu_half_b22 = self.bias_b22 + 1j * 2. * np.pi * np.arange(half + 1) / (self.nfft * self.delta)
        # P13 and the subtracted P(kr)^2 pieces are 1D radial integrals:
        # evaluated directly per-eval (cheap), more accurate than the
        # decomposition through slowly-converging radial kernels
        K13 = p13_radial_kernels(r)
        self.K13 = dict(zip(('p13_dd', 'p13_dt', 'p13_tt'), K13))
        from .spt import sigma3sq_radial_kernel
        self.K13['p_sig3sq'] = sigma3sq_radial_kernel(r)
        self.r = r
        self.wr2 = wr * r ** 2
        # static per-k power factors k^{3 + nu_m} and pair factor via outer sums
        lnk = np.log(self.k)
        self.k_pow = np.exp(np.outer(lnk, nu)) * self.k[:, None] ** 3  # (nk, nfreq) complex... k^{3+nu}
        self._nu = nu

    def _full_eta(self):
        n = self.nfft
        m = np.fft.fftfreq(n, d=1. / n)  # integer frequencies, negative included
        return 2. * np.pi * m / (n * self.delta)

    def coefficients(self, pk_fn, bias=None):
        """Complex decomposition coefficients c_m (full spectrum) of pk."""
        bias = self.bias if bias is None else bias
        xg = jnp.asarray(self.x_grid)
        f = pk_fn(xg) * xg ** (-bias)
        c = jnp.fft.fft(f) / self.nfft
        # phase reference to x_0: c_m -> c_m * x_0^{-i eta_m}
        phase = jnp.asarray(np.exp(-1j * self._full_eta() * np.log(self.x_grid[0])))
        return c * phase

    def coefficients_half(self, pk_fn, bias=None):
        """Half-spectrum (rfft) coefficients c_h, h = 0..N/2."""
        bias = self.bias if bias is None else bias
        xg = jnp.asarray(self.x_grid)
        f = pk_fn(xg) * xg ** (-bias)
        c = jnp.fft.rfft(f) / self.nfft
        half = self.nfft // 2
        eta = 2. * np.pi * np.arange(half + 1) / (self.nfft * self.delta)
        phase = jnp.asarray(np.exp(-1j * eta * np.log(self.x_grid[0])))
        return c * phase

    def _quad_real(self, pk_x, bias, nu_half, Mr, names):
        """All quadratic forms of one bias group as a single stacked real
        einsum (nk, N+2) x (s, N+2, N+2) -> (s, nk). ``pk_x``: pk sampled on
        the (static) decomposition grid."""
        half = self.nfft // 2
        eta = 2. * np.pi * np.arange(half + 1) / (self.nfft * self.delta)
        f = pk_x * jnp.asarray(self.x_grid ** (-bias))
        ch = jnp.fft.rfft(f) / self.nfft
        ch = ch * jnp.asarray(np.exp(-1j * eta * np.log(self.x_grid[0])))
        dh = ch[None, :] * jnp.asarray(np.exp(np.outer(np.log(self.k), nu_half)))
        u = jnp.concatenate([jnp.real(dh), jnp.imag(dh)], axis=1)
        from ..config import loop_matmul_precision
        quad = jnp.einsum('km,smn,kn->sk', u, jnp.asarray(Mr, dtype=u.dtype), u,
                          precision=loop_matmul_precision())
        return dict(zip(names, quad))

    def tables(self, pk_fn):
        """Same contract as OneLoopIntegrals.tables (quadrature engine)."""
        kq = jnp.asarray(self.k)[:, None] * jnp.asarray(self.r)[None, :]
        return self.tables_from_arrays(pk_fn(jnp.asarray(self.x_grid)),
                                       pk_fn(jnp.asarray(self.k)),
                                       pk_fn(kq),
                                       pk_fn(jnp.asarray(SIGMA_V2_Q)))

    def tables_from_arrays(self, pk_x, pk_k, pk_kq, pk_sig):
        """Tables from pk sampled on the engine's STATIC grids — callers that
        hold a spectral representation of pk evaluate all grids with one
        static design-matrix matmul (MXU) instead of per-point recurrences
        (see EPTTracerPowerSpectrumMultipoles.calculate).

        pk_x : (nfft,) on ``x_grid``; pk_k : (nk,) on ``k``;
        pk_kq : (nk, nr) on ``k[:, None] * r``; pk_sig : on ``SIGMA_V2_Q``.
        """
        k3 = jnp.asarray(self.k ** 3)
        out = {}
        for name, quad in self._quad_real(pk_x, self.bias, self._nu_half,
                                          self._Mr, self._names_M).items():
            out[name] = quad * k3
        for name, quad in self._quad_real(pk_x, self.bias_b22, self._nu_half_b22,
                                          self._Mr_b22, self._names_b22).items():
            out[name] = quad * k3
        # 1D radial pieces: P13 and the P(kr)^2 subtractions
        wr2 = jnp.asarray(self.wr2)
        pref = k3 / (2. * np.pi ** 2)
        for name, Kr in self.K13.items():
            out[name] = pref * pk_k * jnp.einsum('kr,r->k', pk_kq, jnp.asarray(Kr) * wr2)
        sub2 = pref / 4. * jnp.einsum('kr,r->k', pk_kq ** 2, wr2)  # int r^2 dr P(kr)^2 / (8 pi^2) * 2
        out['pb22'] = out.pop('pb22_y') - 2. * sub2
        out['pb2s2'] = out.pop('pb2s2_y') - (2. / 3.) * 2. * sub2
        out['pbs22'] = out.pop('pbs22_y') - (4. / 9.) * 2. * sub2
        out['sigma_v2'] = jnp.sum(jnp.asarray(SIGMA_V2_W) * pk_sig) / (6. * np.pi ** 2)
        return out


def _sigma_v2_weights():
    qs = np.geomspace(1e-4, 20., 256)
    wq = np.zeros_like(qs)
    dq = np.diff(qs)
    wq[:-1] += dq / 2.
    wq[1:] += dq / 2.
    return qs, wq


SIGMA_V2_Q, SIGMA_V2_W = _sigma_v2_weights()


def _sigma_v2(pk_fn):
    return jnp.sum(jnp.asarray(SIGMA_V2_W) * pk_fn(jnp.asarray(SIGMA_V2_Q))) / (6. * np.pi ** 2)
