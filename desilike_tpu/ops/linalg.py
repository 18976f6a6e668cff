"""Linear-algebra helpers: chi2, stable block inversion, whitening.

Counterpart of reference ``utils.inv``/``blockinv`` (utils.py) and the jitted
``chi2`` (likelihoods/base.py:13). TPU note: chi2 on a whitened residual
(precompute the Cholesky factor of the precision host-side in float64) is a
single fused matvec + reduction, stable in float32.
"""

import numpy as np
import jax.numpy as jnp


def chi2(flatdiff, precision):
    """Quadratic form d^T P d; precision may be 1D (diagonal) or 2D."""
    if precision.ndim == 1:
        return jnp.sum(flatdiff * precision * flatdiff, axis=-1)
    return jnp.einsum('...i,ij,...j->...', flatdiff, precision, flatdiff)


def whiten_factor(covariance):
    """Return L such that chi2(d) = ||L d||^2, i.e. L^T L = C^{-1}.

    Host-side float64; L = inv(cholesky(C)) so that L C L^T = I.
    """
    cov = np.atleast_2d(np.asarray(covariance, dtype='f8'))
    chol = np.linalg.cholesky(cov)
    return np.linalg.solve(chol, np.eye(cov.shape[0]))


def inv(mat, check_valid='raise'):
    """Stable inverse (host-side float64 numpy); pinv fallback."""
    mat = np.asarray(mat, dtype='f8')
    if mat.ndim == 1 or (mat.ndim == 2 and mat.shape[0] != mat.shape[1]):
        raise ValueError('expected square matrix')
    try:
        return np.linalg.inv(mat)
    except np.linalg.LinAlgError:
        if check_valid == 'raise':
            raise
        return np.linalg.pinv(mat)


def blockinv(blocks, inv=np.linalg.inv):
    """Invert a matrix given as a nested list of blocks, via the block
    decomposition (reference utils.blockinv): numerically stabler for
    ill-conditioned multi-observable covariances.
    """
    def _inv(mat):
        A = mat[0][0]
        if len(mat) == 1:
            return inv(A)
        B = np.concatenate(mat[0][1:], axis=-1)
        C = np.concatenate([row[0] for row in mat[1:]], axis=0)
        D = [row[1:] for row in mat[1:]]
        invD = _inv(D)
        invD_C = invD.dot(C)
        schur = inv(A - B.dot(invD_C))
        tl = schur
        tr = -schur.dot(B).dot(invD)
        bl = -invD_C.dot(schur)
        br = invD + invD_C.dot(schur).dot(B).dot(invD)
        return np.block([[tl, tr], [bl, br]])

    nrows = len(blocks)
    # Re-split the recursive concatenations back into a flat matrix
    blocks = [[np.atleast_2d(np.asarray(b, dtype='f8')) for b in row] for row in blocks]
    return _inv(blocks)


def logdet(mat):
    """Sign-safe log|det| (traced)."""
    return jnp.linalg.slogdet(mat)[1]
