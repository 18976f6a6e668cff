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


def chol_small(A):
    """Cholesky of a small (n<=~64) SPD matrix in pure unrolled jnp ops.

    TPU note: jnp.linalg.cholesky/solve/slogdet lower to LAPACK-style custom
    calls that cost ~5x the whole pipeline when batched under vmap inside a
    fused program (measured on v5e); an unrolled column-by-column Cholesky is
    pure VPU arithmetic and fuses. n is static, so the Python loop unrolls.
    """
    n = A.shape[-1]
    cols = []
    for j in range(n):
        c = A[..., :, j]
        for k in range(j):
            c = c - cols[k] * cols[k][..., j][..., None]
        d = jnp.sqrt(jnp.clip(c[..., j], 1e-30, None))
        mask = np.arange(n) >= j
        cols.append(jnp.where(mask, c / d[..., None], 0.))
    return jnp.stack(cols, axis=-1)  # lower-triangular L with L L^T = A


def chol_solve_small(L, b):
    """Solve A x = b given L = chol_small(A), unrolled substitution."""
    n = L.shape[-1]
    # forward: L y = b
    ys = []
    for i in range(n):
        acc = b[..., i]
        for k in range(i):
            acc = acc - L[..., i, k] * ys[k]
        ys.append(acc / L[..., i, i])
    # backward: L^T x = y
    xs = [None] * n
    for i in range(n - 1, -1, -1):
        acc = ys[i]
        for k in range(i + 1, n):
            acc = acc - L[..., k, i] * xs[k]
        xs[i] = acc / L[..., i, i]
    return jnp.stack(xs, axis=-1)


def chol_logdet_small(L):
    """log det A from L = chol_small(A)."""
    n = L.shape[-1]
    return 2. * sum(jnp.log(L[..., i, i]) for i in range(n))
