"""Galaxy-clustering forecast likelihoods.

Counterpart of reference likelihoods/galaxy_clustering/fisher.py:10
(SNWeightedPowerSpectrumLikelihood): the signal-to-noise-weighted P(k, mu)
likelihood used for Fisher forecasts. TPU-native differences: the (k, mu)
precision is kept DIAGONAL (a weight vector, never a dense matrix), the
multipole -> P(k, mu) projection is one static (nell, nmu) Legendre matmul,
and the whole thing composes with the fused jitted logpost like any other
likelihood (flatdiff_white is elementwise).
"""

import numpy as np
import jax.numpy as jnp

from .base import BaseGaussianLikelihood
from ..utils import is_sequence


class SNWeightedPowerSpectrumLikelihood(BaseGaussianLikelihood):
    r"""Fisher-forecast likelihood integrating anisotropic signal-to-noise
    over mu and k: precision = V/2 (2 pi)^-3 4 pi k^2 dk w_mu / (P + 1/nbar)^2
    per (k, mu) cell.

    Parameters
    ----------
    theories : list of theory multipole calculators (or one)
    data : dict
        Parameters generating the fiducial data vector.
    covariance : dict, optional
        Parameters generating the covariance P(k, mu); defaults to ``data``.
    footprints : list of BaseFootprint (or one)
    klim : (kmin, kmax), optional
        Wavenumber cut (500 linear points).
    mu : int, default=20
        Gauss-Legendre mu nodes on [0, 1].
    """

    def initialize(self, theories=None, data=None, covariance=None, footprints=None,
                   klim=None, mu=20):
        from ..core import Pipeline
        from ..core.collection import CollectionCalculator
        from ..ops.legendre import weights_mu, trapz_weights

        if not is_sequence(theories):
            theories = [theories]
        theories = list(theories)
        if not is_sequence(footprints):
            footprints = [footprints] * len(theories)
        self.footprints = list(footprints)
        if klim is not None:
            k = np.linspace(klim[0], klim[1], 500)
            for theory in theories:
                theory.init.update(k=k)
        self.theories = CollectionCalculator(calculators=theories)
        self.theories.runtime_info.initialize()
        self.mu_nodes, wmu = weights_mu(mu)
        # static multipole -> P(k, mu) projection matrices
        self._legs = []
        for theory in theories:
            theory.runtime_info.initialize()
            legs = np.stack([np.polynomial.legendre.Legendre.basis(ell)(self.mu_nodes)
                             for ell in theory.ells])
            self._legs.append(legs)
        prefactor = 4. * np.pi / (2. * (2. * np.pi) ** 3) * wmu

        pipe = Pipeline(self.theories)
        pipe.evaluate(dict(covariance if covariance is not None else (data or {})))
        wdiag = []
        for theory, footprint, legs in zip(theories, self.footprints, self._legs):
            pkmu = np.asarray(theory.power).T @ legs  # (nk, nmu)
            wk = trapz_weights(np.asarray(theory.k))
            weights = prefactor[None, :] * float(footprint.volume) \
                * (np.asarray(theory.k) ** 2 * wk)[:, None] \
                * (pkmu + float(footprint.shotnoise)) ** -2
            wdiag.append(weights.ravel())
        pipe.evaluate(dict(data or {}))
        flatdata = [(np.asarray(theory.power).T @ legs).ravel()
                    for theory, legs in zip(theories, self._legs)]
        self.flatdata = np.concatenate(flatdata)
        self._wdiag = np.concatenate(wdiag)
        # diagonal whitening: flatdiff_white is an elementwise product, and
        # the generic analytic-marginalization machinery (J @ diff_white)
        # works unchanged
        self._whiten = np.sqrt(self._wdiag)
        self._whiten_base = self._whiten
        self._precision_base = self._wdiag
        self.precision = self._wdiag

    @property
    def size(self):
        return len(self.flatdata)

    @property
    def nmocks(self):
        return 0

    def flattheory(self):
        return jnp.concatenate([
            (theory.power.T @ jnp.asarray(legs, dtype=theory.power.dtype)).ravel()
            for theory, legs in zip(self.theories, self._legs)])

    def calculate(self, **params):
        diff = self.flattheory() - jnp.asarray(self.flatdata)
        self.flatdiff = diff
        self.flatdiff_white = jnp.asarray(self._whiten, dtype=diff.dtype) * diff
        self.loglikelihood = -0.5 * self.flatdiff_white @ self.flatdiff_white


def __getattr__(name):
    # the reference re-exports the observables-Gaussian machinery from
    # likelihoods.galaxy_clustering (ref likelihoods/galaxy_clustering/
    # __init__.py); forward those lookups to likelihoods.base
    from ..utils import forward_module_getattr
    return forward_module_getattr('desilike_tpu.likelihoods')(name)
