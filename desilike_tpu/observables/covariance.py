"""Footprints and analytic Gaussian covariance of multipole observables.

Counterpart of reference observables/galaxy_clustering/covariance.py. All
host-side float64 numpy: covariance assembly happens once at initialization
(the per-evaluation cost is zero; the likelihood uses the Cholesky-whitened
residual).
"""

import numpy as np
from scipy import special

from ..utils import BaseClass
from ..cosmology import background as bg


def integral_legendre_product(ells, range=(-1, 1), norm=False):
    """Integral over ``range`` of a product of Legendre polynomials
    (reference covariance.py:14)."""
    poly = special.legendre(0)
    if np.ndim(ells) == 0:
        ells = [ells]
    for ell in ells:
        poly *= special.legendre(ell)
    integ = poly.integ()
    out = integ(range[-1]) - integ(range[0])
    if norm:
        out /= (range[-1] - range[0])
    return float(out)


class BaseFootprint(BaseClass):
    """3D footprint: density and volume (reference covariance.py:55)."""

    def __init__(self, nbar=None, size=None, volume=None, attrs=None):
        if nbar is None and size is None:
            raise ValueError('provide "nbar" [(h/Mpc)^3] or "size" (number of objects)')
        if volume is None:
            raise ValueError('provide volume [(Mpc/h)^3]')
        self._volume = np.asarray(volume, dtype='f8')
        self._size = None if size is None else np.asarray(size, dtype='f8')
        self._nbar = (self._size / self._volume) if nbar is None else np.asarray(nbar, dtype='f8')
        self.attrs = dict(attrs or {})

    @property
    def volume(self):
        return self._volume

    @property
    def size(self):
        return self._size if self._size is not None else self._nbar * self._volume

    @property
    def nbar(self):
        return self._nbar

    @property
    def shotnoise(self):
        return self.volume / self.size

    def __and__(self, other):
        return BaseFootprint(nbar=self._nbar + other._nbar,
                             volume=min(float(self.volume), float(other.volume)))


class BoxFootprint(BaseFootprint):
    """Cubic box footprint."""


class CutskyFootprint(BaseFootprint):
    """Sky-area + redshift-range footprint (reference covariance.py:123):
    volume from the fiducial cosmology comoving shell, effective nbar from
    an nbar(z) profile."""

    def __init__(self, area=None, zrange=None, nbar=None, cosmo=None, attrs=None):
        if area is None or zrange is None:
            raise ValueError('provide area [deg^2] and zrange')
        p = bg.resolve(cosmo if isinstance(cosmo, dict) else None)
        zrange = np.asarray(zrange, dtype='f8')
        fsky = float(area) * (np.pi / 180.) ** 2 / (4. * np.pi)
        if np.ndim(nbar) == 0:
            zedges = np.array([zrange.min(), zrange.max()])
            nbarz = np.array([float(nbar)])
        else:
            zedges = zrange
            nbarz = np.asarray(nbar, dtype='f8')
        dc = np.asarray([float(bg.comoving_radial_distance(p, z)) for z in zedges])
        shell = 4. / 3. * np.pi * (dc[1:] ** 3 - dc[:-1] ** 3) * fsky
        volume = shell.sum()
        size = (nbarz * shell).sum()
        zmid = (zedges[1:] + zedges[:-1]) / 2.
        self.zeff = float((nbarz ** 2 * shell * zmid).sum() / (nbarz ** 2 * shell).sum())
        self.area = float(area)
        super().__init__(size=size, volume=volume, attrs=attrs)


class ObservablesCovarianceMatrix(BaseClass):
    """Analytic Gaussian covariance for multipole observables
    (reference covariance.py:274). Evaluate the observables' theories at
    given parameters, then assemble per-bin covariances.
    """

    def __init__(self, observables, footprints=None, theories=None, resolution=3):
        from ..utils import is_sequence
        if not is_sequence(observables):
            observables = [observables]
        self.observables = list(observables)
        if not is_sequence(footprints):
            footprints = [footprints] * len(self.observables)
        self.footprints = list(footprints)
        if not is_sequence(theories):
            theories = [theories] * len(self.observables)
        self.theories = list(theories)
        self.resolution = int(resolution)

    def __call__(self, **params):
        self.run(**params)
        return self.covariance

    def run(self, **params):
        from ..core import Pipeline
        # evaluate each observable's theory at the given params
        for io, obs in enumerate(self.observables):
            obs.runtime_info.initialize()
            Pipeline(obs).evaluate(params)
            if self.theories[io] is None:
                self.theories[io] = obs.wmatrix.theory
        blocks = [[None] * len(self.observables) for _ in self.observables]
        for io1 in range(len(self.observables)):
            for io2 in range(io1, len(self.observables)):
                c = self._run(io1, io2)
                blocks[io1][io2] = c
                blocks[io2][io1] = (c + c.T) / 2. if io1 == io2 else c.T
        self.covariance = np.block(blocks)
        return self.covariance

    def _run(self, io1, io2):
        obs1, obs2 = self.observables[io1], self.observables[io2]
        fp1, fp2 = self.footprints[io1], self.footprints[io2]
        th1, th2 = self.theories[io1], self.theories[io2]
        if io1 != io2 and (fp1 is not fp2):
            # different tracers: no cross-covariance (reference limitation too)
            n1 = sum(len(kk) for kk in obs1.wmatrix.k)
            n2 = sum(len(kk) for kk in obs2.wmatrix.k)
            return np.zeros((n1, n2))
        volume = float((fp1 & fp2).volume)

        def make_pk(theory, footprint):
            k = np.asarray(theory.k)
            power = np.asarray(theory.power, dtype='f8')
            ells = tuple(theory.ells)
            sn = float(footprint.shotnoise)

            def pk(kq, ell):
                ill = ells.index(ell)
                return np.interp(kq, k, power[ill] + (ell == 0) * sn)
            pk.ells = ells
            return pk

        pk1, pk2 = make_pk(th1, fp1), make_pk(th2, fp2)

        def sigma_k(ell1, ell2, kq):
            pref = (2 * ell1 + 1) * (2 * ell2 + 1) / volume
            out = 0.
            for la in pk1.ells:
                for lb in pk2.ells:
                    out += pk1(kq, la) * pk2(kq, lb) * integral_legendre_product((la, lb, ell1, ell2))
            return pref * out

        def bin_volume(lo, hi):
            return 4. / 3. * np.pi * (hi ** 3 - lo ** 3)

        cov_rows = []
        for ill1, ell1 in enumerate(obs1.wmatrix.ells):
            row_blocks = []
            edges1 = obs1.wmatrix.kedges[ill1]
            for ill2, ell2 in enumerate(obs2.wmatrix.ells):
                edges2 = obs2.wmatrix.kedges[ill2]
                block = np.zeros((len(edges1), len(edges2)))
                for i1, (lo1, hi1) in enumerate(edges1):
                    for i2, (lo2, hi2) in enumerate(edges2):
                        lo, hi = max(lo1, lo2), min(hi1, hi2)
                        if lo >= hi:
                            continue
                        kq = np.linspace(lo, hi, self.resolution + 2)[1:-1]
                        val = (2. * np.pi) ** 3 * bin_volume(lo, hi) \
                            / (bin_volume(lo1, hi1) * bin_volume(lo2, hi2)) \
                            * np.sum(kq ** 2 * sigma_k(ell1, ell2, kq)) / np.sum(kq ** 2)
                        block[i1, i2] = val
                row_blocks.append(block)
            cov_rows.append(row_blocks)
        return np.block(cov_rows)
