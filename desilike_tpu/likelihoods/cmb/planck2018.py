"""Planck 2018 python likelihoods: plik-lite high-ell + commander/simall low-ell.

Counterparts of reference likelihoods/cmb/planck2018.py (clik-free
reimplementations), redesigned TPU-first:

- plik-lite binning is a precomputed dense (nbins, ellmax+1) matrix per
  spectrum -> one MXU matmul each per evaluation (reference builds the same
  binning, ref planck2018.py:241-261);
- the commander TT low-ell Gibbs posterior (spline change-of-variable) and
  the simall EE probability table are vmapped jnp.interp evaluations --
  tiny (28 x 1000) gathers, negligible;
- data can come from the real clik distribution files (``data_dir=``, same
  layout as the reference, ref planck2018.py:101-107,191-200,229-240) or be
  passed directly as arrays (``data=``) -- the zero-egress test path.

Calibration parameter A_planck carries the standard Planck prior
N(1, 0.0025) (reference planck2018_clik_params.yaml::calib).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..base import BaseLikelihood, BaseGaussianLikelihood


_CALIB_PARAMS = {'A_planck': dict(value=1., prior=dict(dist='norm', loc=1., scale=0.0025),
                                  ref=dict(dist='norm', loc=1., scale=0.002),
                                  proposal=0.0005, latex=r'y_\mathrm{cal}')}


class BasePlanck2018Likelihood(BaseLikelihood):
    """Shared machinery: ClTheory wiring in muK^2 units."""

    def _set_theory(self, theory, requested_cls):
        from .base import ClTheory
        if theory is None:
            raise ValueError('pass theory=ClTheory(tables=...): C_ell tables must be injected '
                             '(no Boltzmann backend in-framework)')
        self.theory = theory
        if isinstance(theory, ClTheory):
            cls = dict(theory.init.get('cls') or {})
            for xy, ellmax in requested_cls.items():
                cls[xy] = max(int(ellmax), int(cls.get(xy, 0)))
            self.theory.init.update(cls=cls, unit='muK', T0=2.7255)


class TTTEEEHighlPlanck2018LiteLikelihood(BasePlanck2018Likelihood, BaseGaussianLikelihood):
    """plik-lite TTTEEE high-ell likelihood: Gaussian in binned C_ell
    (reference planck2018.py:218-267).

    Parameters
    ----------
    theory : ClTheory
    data : dict, default=None
        Arrays: 'flatdata' (ndata,), 'covariance' (ndata, ndata),
        'ellmin'/'ellmax' (nbins,) bin edges (shared bin layout across
        spectra, plik-lite convention), 'weights' (>= max ellmax + 1,)
        per-ell binning weights, 'nbins' list of bin counts per spectrum
        [tt, te, ee]. C_ell in muK^2.
    data_dir : str, default=None
        Real plik-lite clik directory (the '_external' folder contents:
        blmin.dat, blmax.dat, bweight.dat, c_matrix_plik_v22.dat,
        cl_cmb_plik_v22.dat).
    elllim : tuple, default=(30, 2508)
    """

    cls = ('tt', 'te', 'ee')
    nbins_full = (215, 199, 199)
    name = 'TTTEEEHighlPlanck2018Lite'
    _params = dict(BaseLikelihood._params)
    _params.update(_CALIB_PARAMS)

    def initialize(self, theory=None, data=None, data_dir=None, elllim=(30, 2508), **kwargs):
        self.elllim = tuple(elllim)
        if data is None:
            if data_dir is None:
                from ...install import installed_data_dir
                data_dir = installed_data_dir('Planck2018LiteLikelihood')
            if data_dir is None:
                raise ValueError('provide data= arrays or data_dir= with the plik-lite files')
            data = self.load_plik_lite(data_dir)
        ellmin = np.asarray(data['ellmin'], dtype='i8')
        ellmax = np.asarray(data['ellmax'], dtype='i8')
        weights = np.asarray(data['weights'], dtype='f8')
        nbins = list(data.get('nbins', self.nbins_full))
        flatdata = np.asarray(data['flatdata'], dtype='f8')
        covariance = np.asarray(data['covariance'], dtype='f8')

        mask, self._binning, requested_cls = [], [], {}
        for cl, nbin in zip(('tt', 'te', 'ee'), nbins):
            emin, emax = ellmin[:nbin], ellmax[:nbin]
            keep = (emin >= self.elllim[0]) & (emax <= self.elllim[1])
            if cl in self.cls:
                emin, emax = emin[keep], emax[keep]
                requested_cls[cl] = int(emax.max())
                binning = np.zeros((len(emax), emax.max() + 1))
                for i, (lo, hi) in enumerate(zip(emin, emax)):
                    binning[i, lo:hi + 1] = weights[lo:hi + 1]
                self._binning.append(binning)
            else:
                keep[...] = False
            mask.append(keep)
        mask = np.concatenate(mask)
        self._set_theory(theory, requested_cls)
        super(BasePlanck2018Likelihood, self).initialize(
            data=flatdata[mask], covariance=covariance[np.ix_(mask, mask)])

    @classmethod
    def load_plik_lite(cls, data_dir, nbins=None):
        """Read the plik-lite '_external' clik files (reference
        planck2018.py:229-240). Needs scipy for the Fortran-record covariance.

        ``nbins`` : per-spectrum bin counts [tt, te, ee]; defaults to the
        real-release sizes (215, 199, 199). The covariance size is taken
        from the Fortran record itself."""
        offset = 30
        ellmin = np.loadtxt(os.path.join(data_dir, 'blmin.dat')).astype(int) + offset
        ellmax = np.loadtxt(os.path.join(data_dir, 'blmax.dat')).astype(int) + offset
        weights = np.concatenate([np.zeros(offset), np.loadtxt(os.path.join(data_dir, 'bweight.dat'))])
        from scipy.io import FortranFile
        with FortranFile(os.path.join(data_dir, 'c_matrix_plik_v22.dat'), 'r') as f:
            flat = f.read_reals(dtype=float)
        nb = int(round(np.sqrt(flat.size)))
        cov = flat.reshape(nb, nb)
        cov = np.tril(cov) + np.tril(cov, -1).T
        flatdata = np.loadtxt(os.path.join(data_dir, 'cl_cmb_plik_v22.dat'))[:, 1]
        return dict(flatdata=flatdata, covariance=cov, ellmin=ellmin, ellmax=ellmax,
                    weights=weights, nbins=list(cls.nbins_full if nbins is None else nbins))

    def flattheory(self):
        cal = self._A_planck ** 2
        return jnp.concatenate([jnp.asarray(B) @ self.theory.cls[cl][:B.shape[1]]
                                for B, cl in zip(self._binning, self.cls)]) / cal

    def calculate(self, A_planck=1., **kw):
        self._A_planck = A_planck
        BaseGaussianLikelihood.calculate(self)


class TTHighlPlanck2018LiteLikelihood(TTTEEEHighlPlanck2018LiteLikelihood):
    """plik-lite TT-only variant (reference planck2018.py:271)."""

    cls = ('tt',)
    name = 'TTHighlPlanck2018Lite'


class TTLowlPlanck2018Likelihood(BasePlanck2018Likelihood):
    """Commander low-ell TT Gibbs likelihood: Gaussianized via the per-ell
    spline change of variable x(C_ell) (reference planck2018.py:71-157).

    data : dict with
        'cl2x' : (nell, ngrid, 2) per-ell (C_ell grid, x) pairs,
        'mu' : (nell,), 'covariance' : (nell, nell), 'mu_sigma' : (nell,).
    """

    name = 'TTLowlPlanck2018'
    _params = dict(BaseLikelihood._params)
    _params.update(_CALIB_PARAMS)

    def initialize(self, theory=None, data=None, data_dir=None, elllim=(2, 29), **kwargs):
        self.elllim = tuple(elllim)
        if data is None:
            if data_dir is None:
                from ...install import installed_data_dir
                data_dir = installed_data_dir('TTLowlPlanck2018Likelihood')
            if data_dir is None:
                raise ValueError('provide data= arrays or data_dir= with sigma.fits')
            data = self.load_commander(data_dir, self.elllim)
        cl2x = np.asarray(data['cl2x'], dtype='f8')   # (nell, ngrid, 2)
        self._grid = cl2x[..., 0]
        self._x = cl2x[..., 1]
        self.mu = np.asarray(data['mu'], dtype='f8')
        cov = np.asarray(data['covariance'], dtype='f8')
        self.precision = np.linalg.inv(cov)
        # hard prior range: where the x table saturates at +-5
        # (reference planck2018.py:115-124)
        nell, ngrid = self._x.shape
        prior = []
        for i in range(nell):
            notsat = np.abs(self._x[i] + 5.) >= 1e-4
            lo = int(np.argmax(notsat))
            notsat_hi = np.abs(self._x[i] - 5.) >= 1e-4
            hi = ngrid - 1 - int(np.argmax(notsat_hi[::-1]))
            prior.append((self._grid[i, min(lo + 2, ngrid - 1)],
                          self._grid[i, max(hi - 2, 0)]))
        self._prior = np.asarray(prior)
        ells = np.arange(self.elllim[0], self.elllim[1] + 1)
        self.factor = ells * (ells + 1) / 2. / np.pi
        self._set_theory(theory, {'tt': self.elllim[1]})
        # normalization: loglike(mu_sigma) subtracted per evaluation
        # (reference planck2018.py:131, calculate :159); skipped when
        # mu_sigma is absent or lands outside the spline prior range
        self._offset = 0.
        mu_sigma = data.get('mu_sigma')
        if mu_sigma is not None:
            from ...config import host_eval
            with host_eval():
                off = float(self.loglike_of_theory(jnp.asarray(mu_sigma, dtype='f8')))
            if np.isfinite(off):
                self._offset = off

    @classmethod
    def load_commander(cls, data_dir, elllim=(2, 29)):
        """Read the commander 'sigma.fits' clik product (reference
        planck2018.py:101-107): ext 0 image (>=2, nell, ngrid) with rows
        (C_ell grid, x); ext 1 mu; ext 2 covariance; ext 3 mu_sigma."""
        from ... import io_fits
        fn = os.path.join(data_dir, 'sigma.fits')
        sl = slice(elllim[0] - 2, elllim[1] - 2 + 1)
        cl2x = np.asarray(io_fits.read(fn, ext=0), dtype='f8')[:, sl, :]
        return dict(cl2x=np.stack([cl2x[0], cl2x[1]], axis=-1),
                    mu=np.asarray(io_fits.read(fn, ext=1), dtype='f8')[sl],
                    covariance=np.asarray(io_fits.read(fn, ext=2), dtype='f8')[sl, sl],
                    mu_sigma=np.asarray(io_fits.read(fn, ext=3), dtype='f8')[sl])

    def _gauss_x(self, theory):
        """Per-ell x(C_ell) and dx/dC_ell by vmapped piecewise-linear interp."""
        grid = jnp.asarray(self._grid)
        xs = jnp.asarray(self._x)
        x = jax.vmap(jnp.interp)(theory, grid, xs)
        h = 1e-4 * (grid[:, -1] - grid[:, 0])
        dxdcl = (jax.vmap(jnp.interp)(theory + h, grid, xs)
                 - jax.vmap(jnp.interp)(theory - h, grid, xs)) / (2. * h)
        return x, dxdcl

    def loglike_of_theory(self, theory):
        out_of_prior = jnp.any((theory < self._prior[:, 0]) | (theory > self._prior[:, 1]))
        x, dxdcl = self._gauss_x(theory)
        logjac = jnp.sum(jnp.log(jnp.maximum(dxdcl, 1e-30)))
        diff = x - jnp.asarray(self.mu)
        chi2 = diff @ jnp.asarray(self.precision) @ diff
        return jnp.where(out_of_prior, -jnp.inf, logjac - 0.5 * chi2)

    def calculate(self, A_planck=1., **kw):
        theory = self.theory.cls['tt'][self.elllim[0]:self.elllim[1] + 1] \
            * jnp.asarray(self.factor) / A_planck ** 2
        self.loglikelihood = self.loglike_of_theory(theory) - self._offset


class EELowlPlanck2018Likelihood(BasePlanck2018Likelihood):
    """simall low-ell EE likelihood: tabulated per-ell log-probability
    (reference planck2018.py:161-214).

    data : dict with 'prob' (nell, ngrid) log-probability table on the grid
    dcl * (0.5 + arange(ngrid)) in D_ell muK^2.
    """

    name = 'EELowlPlanck2018'
    dcl = 1e-4
    _params = dict(BaseLikelihood._params)
    _params.update(_CALIB_PARAMS)

    def initialize(self, theory=None, data=None, data_dir=None, elllim=(2, 29), **kwargs):
        self.elllim = tuple(elllim)
        if data is None:
            if data_dir is None:
                from ...install import installed_data_dir
                data_dir = installed_data_dir('EELowlPlanck2018Likelihood')
            if data_dir is None:
                raise ValueError('provide data= arrays or data_dir= with probEE')
            data = self.load_simall(data_dir, self.elllim)
        self._prob = np.asarray(data['prob'], dtype='f8')
        ngrid = self._prob.shape[1]
        self._bins = self.dcl * (0.5 + np.arange(ngrid))
        ells = np.arange(self.elllim[0], self.elllim[1] + 1)
        self.factor = ells * (ells + 1) / 2. / np.pi
        self._set_theory(theory, {'ee': self.elllim[1]})

    @classmethod
    def load_simall(cls, data_dir, elllim=(2, 29)):
        """Read the simall 'probEE' clik product (reference
        planck2018.py:191-198): per-ell log-probability tables on the fixed
        3000-point D_ell grid, flat on disk."""
        from ... import io_fits
        prob = np.asarray(io_fits.read(os.path.join(data_dir, 'probEE'), ext=0), dtype='f8')
        prob = prob.reshape(-1, 3000).T[:, slice(elllim[0] - 2, elllim[1] - 2 + 1)]
        return dict(prob=prob.T)

    def calculate(self, A_planck=1., **kw):
        theory = self.theory.cls['ee'][self.elllim[0]:self.elllim[1] + 1] \
            * jnp.asarray(self.factor) / A_planck ** 2
        bins = jnp.asarray(self._bins)
        interp = jax.vmap(lambda cl, prob: jnp.interp(cl, bins, prob, left=-jnp.inf, right=-jnp.inf))
        self.loglikelihood = jnp.sum(interp(theory, jnp.asarray(self._prob)))


# --------------------------------------------------------------------------
# Fixture writers for the real clik file layouts (inverses of the loaders
# above) — so the real-product code paths are exercised by round-trip tests
# in a zero-egress container (same ratchet as camspec/hillipop).

def write_plik_lite_data(data_dir, data):
    """Write the plik-lite '_external' layout read by
    :meth:`TTTEEEHighlPlanck2018LiteLikelihood.load_plik_lite`: blmin/blmax
    (bin edges minus the ell=30 offset), bweight (per-ell weights from
    ell=30), the Fortran-record covariance, and the 3-column binned-Cl
    text file."""
    os.makedirs(data_dir, exist_ok=True)
    offset = 30
    ellmin = np.asarray(data['ellmin'], dtype='i8')
    ellmax = np.asarray(data['ellmax'], dtype='i8')
    weights = np.asarray(data['weights'], dtype='f8')
    np.savetxt(os.path.join(data_dir, 'blmin.dat'), ellmin - offset, fmt='%d')
    np.savetxt(os.path.join(data_dir, 'blmax.dat'), ellmax - offset, fmt='%d')
    np.savetxt(os.path.join(data_dir, 'bweight.dat'), weights[offset:])
    from scipy.io import FortranFile
    cov = np.asarray(data['covariance'], dtype='f8')
    with FortranFile(os.path.join(data_dir, 'c_matrix_plik_v22.dat'), 'w') as f:
        f.write_record(np.ascontiguousarray(cov))
    flatdata = np.asarray(data['flatdata'], dtype='f8')
    np.savetxt(os.path.join(data_dir, 'cl_cmb_plik_v22.dat'),
               np.column_stack([np.arange(1, len(flatdata) + 1), flatdata,
                                np.zeros(len(flatdata))]))


def write_commander_data(data_dir, data):
    """Write the commander 'sigma.fits' layout read by
    :meth:`TTLowlPlanck2018Likelihood.load_commander`: primary image
    (3, nell, ngrid) with rows (C_ell grid, x, unused), then mu /
    covariance / mu_sigma image extensions."""
    from ... import io_fits
    os.makedirs(data_dir, exist_ok=True)
    cl2x = np.asarray(data['cl2x'], dtype='f8')          # (nell, ngrid, 2)
    img = np.stack([cl2x[..., 0], cl2x[..., 1], np.zeros_like(cl2x[..., 0])])
    mu = np.asarray(data['mu'], dtype='f8')
    io_fits.write(os.path.join(data_dir, 'sigma.fits'),
                  [io_fits.Hdu(data=img),
                   io_fits.Hdu(data=mu),
                   io_fits.Hdu(data=np.asarray(data['covariance'], dtype='f8')),
                   io_fits.Hdu(data=np.asarray(data.get('mu_sigma', np.zeros_like(mu)),
                                               dtype='f8'))])


def write_simall_data(data_dir, data):
    """Write the simall 'probEE' layout read by
    :meth:`EELowlPlanck2018Likelihood.load_simall`: the per-ell
    log-probability tables as one image (padded to the fixed 3000-point
    grid with -1e30, matching the real product's dense storage)."""
    from ... import io_fits
    os.makedirs(data_dir, exist_ok=True)
    prob = np.asarray(data['prob'], dtype='f8')
    if prob.shape[1] < 3000:
        prob = np.concatenate([prob, np.full((prob.shape[0], 3000 - prob.shape[1]), -1e30)],
                              axis=1)
    io_fits.write(os.path.join(data_dir, 'probEE'), [io_fits.Hdu(data=prob)])
