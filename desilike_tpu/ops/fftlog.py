"""FFTLog spherical-Bessel (Hankel) transforms: P(k) <-> xi(s).

TPU-native replacement for cosmoprimo's ``PowerToCorrelation`` (used at
reference theories/galaxy_clustering/base.py:76). Design:

- Mellin kernel coefficients u_m = U_l(q + i eta_m) depend only on the static
  log grid, multipole l, and bias q — they are precomputed once host-side in
  float64 with ``scipy.special.loggamma`` (complex), then baked into the
  traced program as constants.
- The per-evaluation path is ``rfft -> complex multiply -> irfft`` on the XLA
  FFT, batched over multipoles and any leading (chain) batch dimensions —
  fully differentiable, no host callbacks.

Math (Hamilton 2000 / mcfit conventions):
  G(y) = \\int_0^inf F(x) j_l(x y) dx / x  on log-uniform grids
  with F decomposed as F(x) = x^q sum_m c_m (x/x_0)^{i eta_m},
  eta_m = 2 pi m / (N delta), gives
  G(y_j) = y_j^{-q} * Re DFT^{-1}[ c_m U_l(q + i eta_m) (x_0 y_0)^{-i eta_m} ]
  where U_l(z) = 2^{z-2} sqrt(pi) Gamma((l+z)/2) / Gamma((3+l-z)/2).
"""

import numpy as np
import jax.numpy as jnp
from scipy.special import loggamma


def _u_ell(ell, z):
    """Mellin transform of j_ell: int_0^inf t^{z-1} j_ell(t) dt (complex z)."""
    return np.exp((z - 2.) * np.log(2.) + 0.5 * np.log(np.pi)
                  + loggamma((ell + z) / 2.) - loggamma((3. + ell - z) / 2.))


class SphericalBesselTransform:
    r"""Batched FFTLog transform G_l(y) = \int_0^inf F(x) j_l(xy) dx/x.

    Parameters
    ----------
    x : array (n,)
        Log-uniform input grid (static).
    ells : tuple of int
        Multipole orders (one output row per ell).
    q : float, default=1.5
        Bias exponent; 1.5 is a good default for P(k) ~ k^{n} inputs.
    lowring : bool, default=True
        Adjust the output grid offset so the Nyquist kernel coefficient is
        real, minimizing ringing.
    """

    def __init__(self, x, ells=(0,), q=1.5, lowring=True):
        x = np.asarray(x, dtype='f8')
        n = x.size
        delta = np.log(x[-1] / x[0]) / (n - 1)
        if not np.allclose(np.diff(np.log(x)), delta, rtol=1e-6):
            raise ValueError('fftlog requires a log-uniform grid')
        self.x = x
        self.ells = tuple(int(ell) for ell in ells)
        self.q = float(q)
        self.n = n
        eta = 2. * np.pi * np.arange(n // 2 + 1) / (n * delta)

        self.y = []
        kernels = []
        for ell in self.ells:
            # lowring: choose ln(x_0 * y_0) so that the Nyquist-mode kernel
            # phase vanishes (mod pi)
            lnxy = 0.0
            if lowring and n % 2 == 0:
                eta_nyq = np.pi / delta
                u_nyq = _u_ell(ell, self.q + 1j * eta_nyq)
                arg = np.angle(u_nyq)
                lnxy = delta / np.pi * arg
            # center the output grid so that x_0 * y_0 * e^{(n-1) delta} ~ e^{lnxy}:
            # y_j = y_0 e^{j delta}, pick y_0 = exp(lnxy - (n-1)*delta) / x_0 so that
            # the y-range mirrors the x-range (y ~ 1/x reversed).
            y0 = np.exp(lnxy) / (x[0] * np.exp((n - 1) * delta))
            y = y0 * np.exp(np.arange(n) * delta)
            u = _u_ell(ell, self.q + 1j * eta) * np.exp(-1j * eta * np.log(x[0] * y0))
            if n % 2 == 0:
                u[-1] = u[-1].real  # enforce hermitian consistency at Nyquist
            self.y.append(y)
            kernels.append(u)
        self.y = np.array(self.y)              # (nell, n)
        self._kernels = np.array(kernels)      # (nell, n//2+1) complex
        self._xq = x ** (-self.q)              # (n,)
        self._yq = self.y ** (-self.q)         # (nell, n)

    def __call__(self, f):
        """Transform F sampled on x.

        Parameters
        ----------
        f : array (..., nell, n) or (nell, n) or (n,)
            One input row per ell (broadcast if 1D).

        Returns
        -------
        y : (nell, n) output grids (one per ell)
        g : array matching f's batch shape, (..., nell, n)
        """
        f = jnp.asarray(f)
        if f.ndim == 1:
            f = jnp.broadcast_to(f, (len(self.ells),) + f.shape)
        xq = jnp.asarray(self._xq, dtype=f.dtype)
        c = jnp.fft.rfft(f * xq, axis=-1)
        kern = jnp.asarray(self._kernels)
        g = jnp.fft.irfft(jnp.conj(c * kern), n=self.n, axis=-1)
        g = g * jnp.asarray(self._yq, dtype=f.dtype)
        return self.y, g


class PowerToCorrelation:
    r"""xi_l(s) = i^l / (2 pi^2) \int dk k^2 P_l(k) j_l(ks).

    Matches cosmoprimo.PowerToCorrelation semantics (the reference's pk->xi
    engine, theories/galaxy_clustering/base.py:76): call with P_l sampled on
    the log-uniform k grid; returns (s, xi) with s ascending, one row per ell.
    """

    def __init__(self, k, ells=(0, 2, 4), q=0, lowring=True):
        # Transform of F(x) = x^3 P(x) / (2 pi^2), kernel j_l, measure dx/x.
        # q here biases the internal decomposition: effective exponent 1.5 - q.
        self.ells = tuple(int(ell) for ell in ells)
        self._sbt = SphericalBesselTransform(k, ells=self.ells, q=1.5 - q, lowring=lowring)
        self.k = self._sbt.x
        self.s = self._sbt.y
        self._signs = np.array([(-1.) ** (ell // 2) for ell in self.ells])

    def __call__(self, pk):
        """pk: (..., nell, nk) -> (s (nell, ns), xi (..., nell, ns))."""
        pk = jnp.asarray(pk)
        if pk.ndim == 1:
            pk = jnp.broadcast_to(pk, (len(self.ells),) + pk.shape)
        k3 = jnp.asarray(self.k ** 3, dtype=pk.dtype)
        f = pk * k3 / (2 * np.pi ** 2)
        s, xi = self._sbt(f)
        signs = jnp.asarray(self._signs, dtype=pk.dtype)[..., None]
        return s, xi * signs


class CorrelationToPower:
    r"""P_l(k) = 4 pi (-i)^l \int ds s^2 xi_l(s) j_l(ks)."""

    def __init__(self, s, ells=(0, 2, 4), q=0, lowring=True):
        self.ells = tuple(int(ell) for ell in ells)
        self._sbt = SphericalBesselTransform(s, ells=self.ells, q=1.5 - q, lowring=lowring)
        self.s = self._sbt.x
        self.k = self._sbt.y
        self._signs = np.array([(-1.) ** (ell // 2) for ell in self.ells])

    def __call__(self, xi):
        xi = jnp.asarray(xi)
        if xi.ndim == 1:
            xi = jnp.broadcast_to(xi, (len(self.ells),) + xi.shape)
        s3 = jnp.asarray(self.s ** 3, dtype=xi.dtype)
        f = xi * s3 * (4 * np.pi)
        k, pk = self._sbt(f)
        signs = jnp.asarray(self._signs, dtype=xi.dtype)[..., None]
        return k, pk * signs
