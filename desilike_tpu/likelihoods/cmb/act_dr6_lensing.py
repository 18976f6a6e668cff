"""ACT DR6 CMB lensing likelihood.

Counterpart of reference likelihoods/cmb/act_dr6_lensing.py (itself adapted
from ACTCollaboration/act_dr6_lenslike): Gaussian in binned C_L^{kk} with
linear normalization (N0) and N1 corrections in both C_kk and the CMB
spectra. All corrections are precomputed matrices -> the evaluation is a
handful of matmuls.
"""

import numpy as np
import jax.numpy as jnp

from ..base import BaseGaussianLikelihood


def pp_to_kk(clpp, ell):
    """C_L^{phiphi} -> C_L^{kappakappa} = [L(L+1)]^2 / 4 C^{pp}."""
    return clpp * (ell * (ell + 1.)) ** 2 / 4.


def corrected_clkk(data, clkk, cls_cmb, suffix='', do_norm_corr=True,
                   do_n1kk_corr=True, do_n1cmb_corr=True):
    """Normalization + N1 corrections (reference act_dr6_lensing.py:16-57).

    data keys used: fiducial_cl_kk, dN1_kk{suffix}, dAL_dC{suffix} (4, n, n),
    fAL{suffix}, fiducial_cl_{tt,ee,bb,te}, dN1_{tt,ee,bb,te}{suffix}.
    """
    clkk_fid = jnp.asarray(data['fiducial_cl_kk'])
    n1_kk = jnp.asarray(data['dN1_kk' + suffix]) @ (clkk - clkk_fid) if do_n1kk_corr else 0.
    dnorm = jnp.asarray(data['dAL_dC' + suffix])
    fid_norm = jnp.asarray(data['fAL' + suffix])
    n1_cmb, norm_corr = 0., 0.
    for i, s in enumerate(('tt', 'ee', 'bb', 'te')):
        cldiff = cls_cmb[s] - jnp.asarray(data['fiducial_cl_' + s])
        if do_n1cmb_corr:
            n1_cmb = n1_cmb + jnp.asarray(data['dN1_' + s + suffix]) @ cldiff
        if do_norm_corr:
            c = -2. * (dnorm[i] @ cldiff)
            ls = jnp.arange(c.shape[0])
            norm_corr = norm_corr + c / jnp.where(ls >= 2, fid_norm, 1.)
    return clkk + norm_corr * clkk_fid + n1_kk + n1_cmb


class ACTDR6LensingLikelihood(BaseGaussianLikelihood):
    """Gaussian likelihood in binned, corrected C_L^{kk}
    (reference act_dr6_lensing.py:60).

    Parameters
    ----------
    theory : ClTheory (requesting pp [+ tt, te, ee, bb unless lens_only])
    data : dict
        'data_binned_clkk', 'cinv' (precision), 'binmat_act' and optionally
        'binmat_planck' + '_planck'-suffixed correction matrices,
        'include_planck', 'likelihood_corrections' flags, plus the
        correction arrays listed in :func:`corrected_clkk`.
    lens_only : bool, default=False
        Skip the CMB-spectra corrections.
    """

    name = 'ACTDR6Lensing'
    trim_ellmax = 2998
    _params = dict(BaseGaussianLikelihood._params)
    _params.update({'Alens': dict(value=1., fixed=True, latex=r'A_\mathrm{lens}')})

    def initialize(self, theory=None, data=None, lens_only=False, **kwargs):
        if data is None:
            raise ValueError("provide data= dict (act_dr6_lenslike load_data layout)")
        self.data = {k: (np.asarray(v) if isinstance(v, (list, tuple, np.ndarray)) else v)
                     for k, v in data.items()}
        self.lens_only = bool(lens_only)
        self.ellmax = int(data.get('trim_ellmax', self.trim_ellmax)) + 1
        self.ells = np.arange(self.ellmax + 1)
        requested = {'pp': self.ellmax}
        if not self.lens_only:
            requested.update({xy: self.ellmax for xy in ('tt', 'te', 'ee', 'bb')})
        from .base import ClTheory
        if theory is None:
            raise ValueError('pass theory=ClTheory(tables=...)')
        self.theory = theory
        if isinstance(theory, ClTheory):
            cls = dict(theory.init.get('cls') or {})
            for xy, ellmax in requested.items():
                cls[xy] = max(int(ellmax), int(cls.get(xy, 0)))
            self.theory.init.update(cls=cls, unit='muK', T0=2.7255)
        super().initialize(data=np.asarray(self.data['data_binned_clkk'], dtype='f8'),
                           precision=np.asarray(self.data['cinv'], dtype='f8'))

    def flattheory(self):
        return self._flattheory

    def calculate(self, Alens=1., **kw):
        clkk = pp_to_kk(self.theory.cls['pp'][:self.ellmax + 1], jnp.asarray(self.ells)) / Alens
        corrections = bool(self.data.get('likelihood_corrections', not self.lens_only))
        if corrections:
            cls_cmb = {s: self.theory.cls[s][:self.ellmax + 1] for s in ('tt', 'ee', 'bb', 'te')}
            clkk_act = corrected_clkk(self.data, clkk, cls_cmb)
        else:
            clkk_act = clkk
        bclkk = jnp.asarray(self.data['binmat_act']) @ clkk_act
        if self.data.get('include_planck'):
            clkk_planck = corrected_clkk(self.data, clkk, cls_cmb, suffix='_planck') \
                if corrections else clkk
            bclkk = jnp.concatenate([bclkk, jnp.asarray(self.data['binmat_planck']) @ clkk_planck])
        self._flattheory = bclkk
        super().calculate()
