"""Linear power spectrum: EH98-based differentiable backend + tabulated input.

Replaces the capability the reference obtains from cosmoprimo's Fourier
sections (power_template.py:54-66 ``_set_base``): pk_dd (delta_cb), pk_tt
(theta_cb, via scale-independent growth f^2 * pk_dd), sigma8/sigma_r,
growth rate f, and the no-wiggle (BAO-filtered) spectrum.
"""

import numpy as np
import jax.numpy as jnp

from . import background as bg
from . import eh


KPIVOT_MPC = 0.05  # primordial pivot, 1/Mpc


def primordial_curvature(p, k):
    """Dimensionless curvature power
    Delta_R^2(k) = A_s (k/kp)^(n_s - 1 + alpha_s/2 ln(k/kp)); k in h/Mpc
    (alpha_s the running of the spectral index, 0 by default — the
    reference's P1D/Lya parameterization varies it, ref lya yaml)."""
    kp = KPIVOT_MPC / p['h']
    lnkr = jnp.log(jnp.asarray(k) / kp)
    tilt = p['n_s'] - 1. + 0.5 * p.get('alpha_s', 0.) * lnkr
    return p['A_s'] * jnp.exp(tilt * lnkr)


def pk_lin(p, k, z=0., nowiggle=False):
    """Linear matter power spectrum P(k, z) in (Mpc/h)^3.

    delta(k, a) = (2 c^2 k^2)/(5 Om H0^2) T(k) D_md(a) R(k) with D_md ~ a in
    matter domination, giving
    P(k,z) = (8 pi^2 / 25) A_s (k/kp)^{ns-1} k T^2(k) D^2(z) / (Om^2 (H0/c)^4).
    """
    k = jnp.asarray(k)
    T = eh.transfer_nowiggle(p, k) if nowiggle else eh.transfer(p, k)
    D = bg.growth_factor(p, z, normalize='md')
    om = bg.Omega_m(p)
    h0_c = 1. / bg.DH_100  # h/Mpc
    amp = (8. * np.pi ** 2 / 25.) * primordial_curvature(p, k) / (om ** 2 * h0_c ** 4)
    return amp * k * T ** 2 * D ** 2


_SIGMA_K = np.geomspace(1e-5, 50., 1024)
_SIGMA_LNK_W = None


def _sigma_weights():
    global _SIGMA_LNK_W
    if _SIGMA_LNK_W is None:
        lnk = np.log(_SIGMA_K)
        w = np.zeros_like(lnk)
        d = np.diff(lnk)
        w[:-1] += d / 2.
        w[1:] += d / 2.
        _SIGMA_LNK_W = w
    return _SIGMA_LNK_W


def tophat_window(x):
    """Fourier transform of the spherical tophat: 3 (sin x - x cos x)/x^3."""
    x = jnp.asarray(x)
    xs = jnp.where(x < 1e-3, 1e-3, x)
    w = 3. * (jnp.sin(xs) - xs * jnp.cos(xs)) / xs ** 3
    # series for small x: 1 - x^2/10
    return jnp.where(x < 1e-3, 1. - x * x / 10., w)


def sigma_r(p, r, z=0., pk_func=None):
    """sigma(R, z): rms of matter fluctuations in spheres of radius R Mpc/h."""
    k = jnp.asarray(_SIGMA_K)
    pk = pk_lin(p, k, z) if pk_func is None else pk_func(k)
    w = tophat_window(k * r)
    integ = jnp.sum(jnp.asarray(_sigma_weights()) * k ** 3 * pk * w ** 2)
    return jnp.sqrt(integ / (2. * np.pi ** 2))


def sigma8(p, z=0.):
    return sigma_r(p, 8., z)


def smoothing_matrix(lnk, sigma=0.25):
    """Gaussian smoothing matrix over ln k (static, row-normalized).

    Used by the no-wiggle filter: a single (nk, nk) matmul per evaluation,
    differentiable, MXU-friendly when batched.
    """
    lnk = np.asarray(lnk, dtype='f8')
    d = lnk[:, None] - lnk[None, :]
    w = np.exp(-0.5 * (d / sigma) ** 2)
    w /= w.sum(axis=1, keepdims=True)
    return w


class NoWiggleFilter:
    """BAO wiggle/no-wiggle split: TPU-native 'peakaverage' equivalent.

    Replaces cosmoprimo.PowerSpectrumBAOFilter (reference power_template.py:4).
    Method: divide pk by the analytic EH98 no-wiggle shape, smooth the ratio
    in ln k with a fixed Gaussian kernel matrix (so the broadband, which is
    slowly varying, passes through while the BAO oscillations average out),
    and multiply back. Fully jit/grad-safe: the kernel matrix is static.
    """

    def __init__(self, k, sigma=0.25):
        self.k = np.asarray(k, dtype='f8')
        self._smooth = smoothing_matrix(np.log(self.k), sigma=sigma)

    def __call__(self, pk, pk_nw_ref):
        """pk: (..., nk) wiggly spectrum; pk_nw_ref: (..., nk) smooth reference
        shape (e.g. EH98 no-wiggle, any normalization). Returns pknow."""
        ratio = pk / pk_nw_ref
        smooth = jnp.einsum('ij,...j->...i', jnp.asarray(self._smooth, dtype=pk.dtype), ratio)
        return smooth * pk_nw_ref


# --- injected-table engine (production path) ---

def pk_lin_table(p, p_fid, lnk_tab, lnpk_tab, k, z=0.):
    """Linear pk from an injected high-accuracy table, ratio-corrected.

    The production protocol (SURVEY.md §2.10): a Boltzmann code computes
    P(k, z=0) ONCE at the fiducial cosmology; parameter response comes from
    exact factors where the physics factorizes and the EH98 transfer RATIO
    where it does not:

        P(k, z; p) = P_tab(k)
                     * [D(z; p) / D(0; p_fid)]^2            (exact, scale-indep growth)
                     * Delta_R^2(k; p) / Delta_R^2(k; p_fid) (exact: A_s, n_s)
                     * [Om_m(p_fid) / Om_m(p)]^2             (exact: Poisson factor)
                     * [T_eh(k; p) / T_eh(k; p_fid)]^2       (shape response)

    At p == p_fid this returns the injected table exactly (Boltzmann
    accuracy); away from it only the *response* carries EH98-level error,
    so the leading few-percent EH98 transfer bias cancels. Differentiable in
    all parameters.

    lnk_tab/lnpk_tab: ln k (h/Mpc), ln P in (Mpc/h)^3 at z=0, p_fid.
    """
    k = jnp.asarray(k)
    lnk = jnp.log(k)
    base = jnp.exp(jnp.interp(lnk, jnp.asarray(lnk_tab), jnp.asarray(lnpk_tab)))
    growth = bg.growth_factor(p, z, normalize='md') / bg.growth_factor(p_fid, 0., normalize='md')
    prim = primordial_curvature(p, k) / primordial_curvature(p_fid, k)
    om = bg.Omega_m(p_fid) / bg.Omega_m(p)
    t_ratio = eh.transfer(p, k) / eh.transfer(p_fid, k)
    return base * growth ** 2 * prim * om ** 2 * t_ratio ** 2


def table_nowiggle_amplitude(p_fid, lnk_tab, lnpk_tab):
    """Scalar matching the EH98 amplitude to an injected table: the
    no-wiggle companion of :func:`pk_lin_table` is
    alpha * pk_lin(p, k, z, nowiggle=True) (same response algebra, smooth
    shape from EH98, normalization from the table)."""
    k = np.exp(np.asarray(lnk_tab))
    sel = (k > 5e-3) & (k < 0.5)
    ln_eh = np.log(np.asarray(pk_lin(p_fid, jnp.asarray(k[sel]), 0.)))
    return float(np.exp(np.mean(np.asarray(lnpk_tab)[sel] - ln_eh)))
