"""Planck 2020 (NPIPE) lollipop low-ell polarization likelihood.

Counterpart of reference likelihoods/cmb/lollipop.py (itself a JAX port of
planck-npipe/lollipop): offset Hamimeche & Lewis (2008) likelihood on binned
EE/BB/EB cross-spectra.

TPU-first redesign: the 2x2 matrix functions in the H&L transform use the
CLOSED-FORM symmetric eigendecomposition (rotation angle via atan2) instead
of LAPACK eigh — vmapped over bins this is pure elementwise math, while
batched LAPACK custom calls under vmap cost ~5x a whole pipeline on TPU
(see ops/linalg.py). Binning is a precomputed matrix product.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..base import BaseLikelihood


_CALIB_PARAMS = {'A_planck': dict(value=1., prior=dict(dist='norm', loc=1., scale=0.0025),
                                  ref=dict(dist='norm', loc=1., scale=0.002),
                                  proposal=0.0005, latex=r'y_\mathrm{cal}')}


def ghl(x):
    """Hamimeche & Lewis g(x) = sign(x-1) sqrt(2 (x - ln x - 1))."""
    return jnp.sign(x - 1.) * jnp.sqrt(2. * jnp.maximum(x - jnp.log(jnp.maximum(x, 1e-30)) - 1., 0.))


def eigh2(m):
    """Closed-form eigendecomposition of a symmetric 2x2 [[a, b], [b, c]]:
    returns (w, V) with m = V diag(w) V^T. Smooth in the entries (rotation
    angle via atan2), no LAPACK."""
    a, b, c = m[0, 0], m[0, 1], m[1, 1]
    half_tr = 0.5 * (a + c)
    r = jnp.sqrt(jnp.maximum((0.5 * (a - c)) ** 2 + b ** 2, 1e-300))
    w = jnp.stack([half_tr - r, half_tr + r])
    theta = 0.5 * jnp.arctan2(2. * b, a - c)
    cs, sn = jnp.cos(theta), jnp.sin(theta)
    # columns are eigenvectors for (half_tr - r, half_tr + r)
    V = jnp.array([[-sn, cs], [cs, sn]])
    return w, V


def matfunc2(m, fn):
    """f(M) for symmetric 2x2 via the closed-form eigendecomposition."""
    w, V = eigh2(m)
    return (V * fn(w)[None, :]) @ V.T


def binning_matrix(lmins, lmaxs, lmax, dl_weight=True):
    """(nbins, lmax+1) averaging matrix; weights l(l+1)/2pi when dl_weight
    (reference lollipop.py:74-103)."""
    ell = np.arange(lmax + 1)
    w = ell * (ell + 1) / (2. * np.pi) if dl_weight else np.ones(lmax + 1)
    P = np.zeros((len(lmins), lmax + 1))
    for b, (lo, hi) in enumerate(zip(lmins, lmaxs)):
        P[b, lo:hi + 1] = w[lo:hi + 1] / (hi - lo + 1)
    return P


def lollipop_bins(lmin=2, lmax=30):
    """The lollipop fixed binning: unit bins below ell=36, delta=10 above
    (reference lollipop.py:128-149)."""
    if lmax <= 35:
        lmins = list(range(lmin, lmax + 1))
        lmaxs = list(range(lmin, lmax + 1))
    elif lmin >= 36:
        lmins = list(range(lmin, lmax - 8, 10))
        lmaxs = [lo + 9 for lo in lmins]
    else:
        lmins = list(range(lmin, 36)) + list(range(36, lmax - 8, 10))
        lmaxs = list(range(lmin, 36)) + [lo + 9 for lo in range(36, lmax - 8, 10)]
    return np.asarray(lmins), np.asarray(lmaxs)


def compute_offsets(lbin, varcl, clref, fsky=0.52, niter=10):
    """Noise offsets from the covariance diagonal (reference
    lollipop.py:111-115)."""
    Nl = np.sqrt(np.abs(varcl - (2. / (2. * lbin + 1) * clref ** 2) / fsky))
    for _ in range(niter):
        Nl = np.sqrt(np.abs(varcl - 2. / (2. * lbin + 1) / fsky * (clref ** 2 + 2. * Nl * clref)))
    return Nl * np.sqrt((2. * lbin + 1) / 2.)


class LollipopLikelihood(BaseLikelihood):
    """Offset-H&L likelihood on low-ell polarization (modes 'lowlE',
    'lowlB', 'lowlEB').

    Parameters
    ----------
    theory : ClTheory
    data : dict
        'cl' : (3, lmax+1) measured D_ell (EE, BB, EB) in muK^2,
        'fiducial' : (3, lmax+1) fiducial D_ell,
        'covariance' : (3 nell, 3 nell) C_ell covariance over
        ell = 2..lmax_cov per block (EE, BB, EB blocks),
        optionally 'fsky' (0.52), 'nsim' (400).
    mode : str
    marginalised_over_covariance : bool, default=True
        Sellentin-Heavens style: chi2 -> Nsim log(1 + chi2/(Nsim-1)).
    """

    name = 'Lollipop'
    lmin, lmax = 2, 30
    _params = dict(BaseLikelihood._params)
    _params.update(_CALIB_PARAMS)

    def initialize(self, theory=None, data=None, data_dir=None, mode='lowlEB', fsky=None,
                   marginalised_over_covariance=True, **kwargs):
        if mode not in ('lowlE', 'lowlB', 'lowlEB'):
            raise ValueError('mode must be lowlE/lowlB/lowlEB')
        self.mode = mode
        self.marginalised_over_covariance = bool(marginalised_over_covariance)
        if data is None and data_dir is None:
            from ...install import installed_data_dir
            data_dir = installed_data_dir('Planck2020LollipopLikelihood')
        if data is None and data_dir is not None:
            data = read_lollipop_data(data_dir)
        if data is None:
            raise ValueError("provide data= {'cl', 'fiducial', 'covariance', ...} "
                             'or data_dir= with the PR4 lollipop files')
        self.nsim = int(data.get('nsim', 400))
        fsky = float(data.get('fsky', 0.52) if fsky is None else fsky)

        lmins, lmaxs = lollipop_bins(self.lmin, self.lmax)
        self._P = binning_matrix(lmins, lmaxs, self.lmax, dl_weight=False)
        self.lbin = (lmins + lmaxs) / 2.
        nbins = len(lmins)

        cl = np.asarray(data['cl'], dtype='f8')[:, :self.lmax + 1]
        fid = np.asarray(data['fiducial'], dtype='f8')[:, :self.lmax + 1]
        self.cldata = cl @ self._P.T          # (3, nbins)
        self.clfid = fid @ self._P.T

        clcov = np.asarray(data['covariance'], dtype='f8')
        nell = clcov.shape[0] // 3
        # bin the (EE, BB, EB) covariance blocks (reference bin_covEB)
        Pc = binning_matrix(lmins, lmaxs, self.lmax, dl_weight=False)
        # covariance rows start at ell=2
        embed = np.zeros((self.lmax + 1, nell))
        embed[2:self.lmax + 1, :self.lmax - 1] = np.eye(self.lmax - 1)
        B = Pc @ embed                        # (nbins, nell)
        if self.mode == 'lowlEB':
            blocks = [[B @ clcov[i * nell:(i + 1) * nell, j * nell:(j + 1) * nell] @ B.T
                       for j in range(3)] for i in range(3)]
            cbcov = np.block(blocks)
            self.invclcov = np.linalg.pinv(cbcov, rcond=1e-9)
        else:
            i = 0 if self.mode == 'lowlE' else 1
            cbcov = B @ clcov[i * nell:(i + 1) * nell, i * nell:(i + 1) * nell] @ B.T
            self.invclcov = np.linalg.inv(cbcov)
        clvar = np.diag(cbcov).reshape(-1, nbins) if self.mode == 'lowlEB' \
            else np.diag(cbcov)[None, :]

        # offsets; EB forced to zero (reference lollipop.py:300-301)
        if self.mode == 'lowlEB':
            self.cloff = compute_offsets(self.lbin, clvar, np.asarray(self.clfid), fsky=fsky)
            self.cloff[2:] = 0.
        else:
            i = 0 if self.mode == 'lowlE' else 1
            self.cloff = compute_offsets(self.lbin, clvar[0], np.asarray(self.clfid[i]), fsky=fsky)

        cls_needed = {'ee': self.lmax, 'bb': self.lmax} if self.mode != 'lowlE' \
            else {'ee': self.lmax, 'bb': self.lmax}
        from .base import ClTheory
        if theory is None:
            raise ValueError('pass theory=ClTheory(tables=...)')
        self.theory = theory
        if isinstance(theory, ClTheory):
            cls = dict(theory.init.get('cls') or {})
            for xy, ellmax in cls_needed.items():
                cls[xy] = max(int(ellmax), int(cls.get(xy, 0)))
            self.theory.init.update(cls=cls, unit='muK', T0=2.7255)
        ells = np.arange(self.lmax + 1)
        self.factor = ells * (ells + 1) / 2. / np.pi

    def _chi2_2fields(self, clth_bins, cal):
        """Offset-H&L over [[EE, EB], [EB, BB]] per bin, vmapped with
        closed-form 2x2 eigendecompositions."""
        cloff = jnp.asarray(self.cloff)
        cldata = jnp.asarray(self.cldata)
        clfid = jnp.asarray(self.clfid)

        def x_of_bin(off, dat, mod, fid):
            O = jnp.array([[off[0], off[2]], [off[2], off[1]]])
            D = jnp.array([[dat[0], dat[2]], [dat[2], dat[1]]]) * cal + O
            M = jnp.array([[mod[0], mod[2]], [mod[2], mod[1]]]) + O
            F = jnp.array([[fid[0], fid[2]], [fid[2], fid[1]]]) + O
            Minv_half = matfunc2(M, lambda w: 1. / jnp.sqrt(jnp.maximum(w, 1e-30)))
            P = Minv_half @ D @ Minv_half
            w, V = eigh2(P)
            G = (V * (jnp.sign(w) * ghl(jnp.abs(w)))[None, :]) @ V.T
            F_half = matfunc2(F, lambda w: jnp.sqrt(jnp.maximum(w, 0.)))
            X = F_half @ G @ F_half
            return jnp.array([X[0, 0], X[1, 1], X[0, 1]])

        x = jax.vmap(x_of_bin, in_axes=(1, 1, 1, 1), out_axes=1)(
            cloff, cldata, clth_bins, clfid)          # (3, nbins)
        x = x.reshape(-1)
        chi2 = x @ jnp.asarray(self.invclcov) @ x
        if self.marginalised_over_covariance:
            chi2 = self.nsim * jnp.log(1. + chi2 / (self.nsim - 1.))
        return chi2

    def _chi2_1field(self, clth_bin, cal):
        i = 0 if self.mode == 'lowlE' else 1
        off = jnp.asarray(self.cloff)
        dat = jnp.asarray(self.cldata[i])
        fid = jnp.asarray(self.clfid[i])
        x = (dat * cal + off) / (clth_bin + off)
        g = jnp.sign(x) * ghl(jnp.abs(x))
        X = jnp.sqrt(fid + off) * g * jnp.sqrt(fid + off)
        chi2 = X @ jnp.asarray(self.invclcov) @ X
        if self.marginalised_over_covariance:
            chi2 = self.nsim * jnp.log(1. + chi2 / (self.nsim - 1.))
        return chi2

    def calculate(self, A_planck=1., **kw):
        factor = jnp.asarray(self.factor)
        P = jnp.asarray(self._P)
        dl = {xy: self.theory.cls[xy][:self.lmax + 1] * factor for xy in ('ee', 'bb')}
        cal = A_planck ** 2
        if self.mode == 'lowlEB':
            clth = jnp.stack([P @ dl['ee'], P @ dl['bb'], jnp.zeros(P.shape[0])])
            chi2 = self._chi2_2fields(clth, cal)
        else:
            xy = 'ee' if self.mode == 'lowlE' else 'bb'
            chi2 = self._chi2_1field(P @ dl[xy], cal)
        self.loglikelihood = -0.5 * chi2


# --------------------------------------------------------------------------
# Real Planck PR4 (NPIPE) lollipop file layout: reader + writer
#
# The reference reads (ref lollipop.py:230-232, 260-273):
#   cl_lolEB_NPIPE.dat        text columns (ell, EE, BB, EB): measured
#                             cross-spectrum D_ell
#   fiducial_lolEB_planck2018_tensor_lensedCls.dat   same layout, fiducial
#   clcov_lolEB_NPIPE.fits    image: (3 nell, 3 nell) unbinned C_ell
#                             covariance, (EE, BB, EB) blocks from ell=2
# The FITS file goes through the in-repo codec (desilike_tpu/io_fits.py).

CL_FILE = 'cl_lolEB_NPIPE.dat'
FIDUCIAL_FILE = 'fiducial_lolEB_planck2018_tensor_lensedCls.dat'
CL_COV_FILE = 'clcov_lolEB_NPIPE.fits'


def _read_dl_dat(filename):
    """(ell, EE, BB, EB) text -> dense (3, lmax+1) (reference
    lollipop.py:118-125)."""
    data = np.loadtxt(filename).T
    l = np.asarray(data[0], dtype='i8')
    dl = np.zeros((3, int(l.max()) + 1))
    for i in range(3):
        dl[i, l] = data[1 + i]
    return dl


def read_lollipop_data(data_dir, cl_file=CL_FILE, fiducial_file=FIDUCIAL_FILE,
                       cl_cov_file=CL_COV_FILE):
    """Load the real Planck PR4 lollipop products; returns the dict consumed
    by ``LollipopLikelihood(data=...)``."""
    from ... import io_fits
    return dict(cl=_read_dl_dat(os.path.join(data_dir, cl_file)),
                fiducial=_read_dl_dat(os.path.join(data_dir, fiducial_file)),
                covariance=np.asarray(io_fits.read(os.path.join(data_dir, cl_cov_file)),
                                      dtype='f8'))


def write_lollipop_data(data_dir, data, cl_file=CL_FILE, fiducial_file=FIDUCIAL_FILE,
                        cl_cov_file=CL_COV_FILE):
    """Write the Planck PR4 lollipop file layout (inverse of
    :func:`read_lollipop_data`) — fixture generator for exercising the
    real-product readers without network access."""
    from ... import io_fits
    os.makedirs(data_dir, exist_ok=True)
    for key, fn in (('cl', cl_file), ('fiducial', fiducial_file)):
        dl = np.asarray(data[key], dtype='f8')
        ell = np.arange(dl.shape[1])
        np.savetxt(os.path.join(data_dir, fn),
                   np.column_stack([ell, dl[0], dl[1], dl[2]]))
    io_fits.write(os.path.join(data_dir, cl_cov_file),
                  [io_fits.Hdu(data=np.asarray(data['covariance'], dtype='f8'))])


class EELowlPlanck2020LollipopLikelihood(LollipopLikelihood):
    name = 'EELowlPlanck2020lollipop'

    def initialize(self, *args, **kwargs):
        kwargs.setdefault('mode', 'lowlE')
        super().initialize(*args, **kwargs)


class BBLowlPlanck2020LollipopLikelihood(LollipopLikelihood):
    name = 'BBLowlPlanck2020lollipop'

    def initialize(self, *args, **kwargs):
        kwargs.setdefault('mode', 'lowlB')
        super().initialize(*args, **kwargs)


class EBLowlPlanck2020LollipopLikelihood(LollipopLikelihood):
    name = 'EBLowlPlanck2020lollipop'

    def initialize(self, *args, **kwargs):
        kwargs.setdefault('mode', 'lowlEB')
        super().initialize(*args, **kwargs)
