"""Window-matrix convolution of theory multipoles.

Counterpart of reference observables/galaxy_clustering/window.py:14-535.
The per-evaluation path is one fused matmul: flat theory vector (nell*nkin)
-> W @ p (+ offset) -> masked flat data vector. W is assembled host-side in
float64 from (a) k-masking, (b) bin-integration in the continuous limit, or
(c) a user-provided matrix with input grid.
"""

from collections.abc import Mapping

import numpy as np
import jax.numpy as jnp

from ..core import Calculator


def _template_names(spec):
    """Parameter names for a systematic-templates spec (dict keys, or
    generated syst_i for sequences / a single template)."""
    if spec is None:
        return []
    if isinstance(spec, Mapping):
        return [str(name) for name in spec.keys()]
    if callable(spec) or getattr(spec, 'ndim', None) is not None:
        spec = [spec]
    return ['syst_{:d}'.format(i) for i in range(len(spec))]


def _template_params(init):
    """_params hook shared by the windowed observables: one linear amplitude
    per template (post-window, reference window.py:1253-1433)."""
    names = _template_names(init.get('systematic_templates', None))
    return {name: dict(value=0., prior=dict(dist='norm', loc=0., scale=10.),
                       ref=dict(limits=[-1e-3, 1e-3]),
                       latex='s_{{{}}}'.format(i))
            for i, name in enumerate(names)}


def _flat_templates(spec, x_list):
    """Evaluate a templates spec to a static (ntemplates, nflat) matrix on
    the flat output data vector: callables are evaluated per multipole grid
    and concatenated; arrays are flat vectors or per-ell stacks."""
    nflat = sum(len(x) for x in x_list)
    if isinstance(spec, Mapping):
        values = list(spec.values())
    elif callable(spec) or getattr(spec, 'ndim', None) is not None:
        values = [spec]
    else:
        values = list(spec)
    rows = []
    for t in values:
        if callable(t):
            flat = np.concatenate([np.asarray(t(np.asarray(x)), dtype='f8') for x in x_list])
        else:
            t = np.asarray(t, dtype='f8')
            if t.ndim == 1 and t.size == nflat:
                flat = t
            elif t.ndim == 2 and t.shape[0] == len(x_list):
                flat = np.concatenate([np.asarray(row)[:len(x)] for row, x in zip(t, x_list)])
            else:
                raise ValueError('template shape {} does not match flat data size {} '
                                 '(per-ell sizes {})'.format(t.shape, nflat, [len(x) for x in x_list]))
        if flat.size != nflat:
            raise ValueError('template size {} != flat data size {}'.format(flat.size, nflat))
        rows.append(flat)
    return np.stack(rows)


def matrix_lininterp(xout, xin):
    """(nout, nin) linear-interpolation matrix: f(xout) ~= M @ f(xin)."""
    xout = np.asarray(xout, dtype='f8')
    xin = np.asarray(xin, dtype='f8')
    M = np.zeros((xout.size, xin.size), dtype='f8')
    idx = np.clip(np.searchsorted(xin, xout, side='right') - 1, 0, xin.size - 2)
    x0 = xin[idx]
    x1 = xin[idx + 1]
    t = np.clip((xout - x0) / (x1 - x0), 0., 1.)
    M[np.arange(xout.size), idx] = 1. - t
    M[np.arange(xout.size), idx + 1] = t
    return M


def window_matrix_bininteg(list_edges, resolution=1):
    r"""Bin-integration window in the continuous limit (reference window.py:14):
    each output bin is \int dx x^2 f(x) / \int dx x^2 over the bin, evaluated
    at ``resolution`` volume-weighted points per bin and referred back to a
    common fine input grid by linear interpolation.

    Returns (xin, full_matrix with shape (sum_l nbins_l, nells * nin)).
    """
    resolution = int(resolution)
    if resolution <= 0:
        raise ValueError('resolution must be positive')
    if np.ndim(list_edges[0]) == 0:
        list_edges = [list_edges]
    list_edges = [np.asarray(e, dtype='f8') for e in list_edges]
    # edges given as (nbins, 2) pairs or 1D array of edges
    list_edges = [np.column_stack([e[:-1], e[1:]]) if e.ndim == 1 else e for e in list_edges]

    step = min((e[:, 1] - e[:, 0]).min() for e in list_edges) / resolution
    start = min(e.min() for e in list_edges)
    stop = max(e.max() for e in list_edges)
    edgesin = np.arange(start, stop + step / 2., step)
    # volume-weighted centers: 3/4 (x1^4 - x0^4)/(x1^3 - x0^3)
    xin = 0.75 * (edgesin[1:] ** 4 - edgesin[:-1] ** 4) / (edgesin[1:] ** 3 - edgesin[:-1] ** 3)

    mats = []
    for edges in list_edges:
        xs, ws = [], []
        nbins = len(edges)
        for ibin, (lo, hi) in enumerate(edges):
            sub = np.linspace(lo, hi, resolution + 1)
            xs.append(0.75 * (sub[1:] ** 4 - sub[:-1] ** 4) / (sub[1:] ** 3 - sub[:-1] ** 3))
            vol = sub[1:] ** 3 - sub[:-1] ** 3
            line = np.zeros(nbins * resolution)
            line[ibin * resolution:(ibin + 1) * resolution] = vol / vol.sum()
            ws.append(line)
        # (nbins, npoints) @ (npoints, nin) -> (nbins, nin)
        mats.append(np.stack(ws) @ matrix_lininterp(np.concatenate(xs), xin))
    nells = len(mats)
    rows = []
    for i, mat in enumerate(mats):
        blockrow = [mat if j == i else np.zeros_like(mats[j]) for j in range(nells)]
        rows.append(blockrow)
    full = np.block(rows)  # (sum nbins, nells * nin)
    return xin, full


def window_matrix_RR(soutedges, sedges, muedges, wcounts, ellsin=(0, 2, 4), resolution=1):
    r"""xi window matrix from measured RR(s, mu) pair counts (reference
    window.py:71): incomplete / non-uniform mu coverage of the random pairs
    weights the Legendre projection, mixing input multipoles.

    Parameters
    ----------
    soutedges : dict ell -> (nout, 2) output bin edges
    sedges : RR s-edges, (ns+1,) or (ns, 2)
    muedges : mu-edges, (nmu+1,)
    wcounts : (ns, nmu) RR weighted pair counts
    ellsin : input theory multipoles
    resolution : bin-integration points per fine RR bin

    Returns (sin, matrix with shape (sum_l nout_l, nellsin * nsin)).
    """
    from numpy.polynomial.legendre import Legendre
    sedges = np.asarray(sedges, dtype='f8')
    if sedges.ndim == 1:
        sedges = np.column_stack([sedges[:-1], sedges[1:]])
    muedges = np.asarray(muedges, dtype='f8')
    wcounts = np.asarray(wcounts, dtype='f8')
    ns = len(sedges)
    sin, binm = window_matrix_bininteg([sedges], resolution=resolution)  # (ns, nsin)

    blocks = []
    for ellout, edges_out in soutedges.items():
        edges_out = np.asarray(edges_out, dtype='f8')
        if edges_out.ndim == 1:
            edges_out = np.column_stack([edges_out[:-1], edges_out[1:]])
        start = np.flatnonzero(np.isclose(sedges[:, 0], edges_out[0, 0]))
        if not start.size:
            raise ValueError('output edges start {} not found in RR s-edges'.format(edges_out[0, 0]))
        start = int(start[0])
        factor = int(np.rint((edges_out[0, 1] - edges_out[0, 0]) / (sedges[start, 1] - sedges[start, 0])))
        if factor < 1:
            raise ValueError('RR s-resolution is coarser than the requested output binning')
        nout = len(edges_out)
        row = []
        for ellin in ellsin:
            integ = (Legendre.basis(ellout) * Legendre.basis(ellin)).integ()
            legint = integ(muedges[1:]) - integ(muedges[:-1])       # per mu bin
            # per-fine-bin mu-average coefficient, grouped by output bin
            M = np.zeros((ns, nout))
            for iout in range(nout):
                iin = start + factor * iout
                wc = wcounts[iin:iin + factor]                       # (factor, nmu)
                wcmu = wc.sum(axis=0)
                nonzero = wcmu != 0.
                frac = wc / np.where(nonzero, wcmu, 1.)
                covered = np.sum(nonzero * np.diff(muedges))
                coeff = (2. * ellout + 1.) * np.einsum('fm,m->f', frac, nonzero * legint) \
                    / (covered if covered > 0. else 1.)
                # the per-row mu shares frac_f = wc_f / sum_f wc_f carry the
                # RR s-profile within the output bin as the fine-bin weight
                # (for uniform randoms RR is volumetric, recovering the
                # volume-weighted bin integration)
                M[iin:iin + factor, iout] = coeff
            row.append(M.T @ binm)                                   # (nout, nsin)
        blocks.append(row)
    full = np.block(blocks)
    return sin, full


class WindowedPowerSpectrumMultipoles(Calculator):
    """Window-convolved theory P_l(k) (reference window.py:151).

    Parameters
    ----------
    klim : dict ell -> (kmin, kmax[, step]) or None
        Output limits/binning per multipole.
    k : array or dict ell -> array
        Output k centers (alternative to klim).
    wmatrix : None, {'resolution': n}, or (kin, matrix) tuple
        Window specification: None = evaluate theory directly at output k;
        resolution = continuous bin-integration; explicit matrix with its
        input theory grid.
    theory : theory multipoles calculator
    shotnoise : float
        Shot noise subtracted at ell=0 (added to theory before windowing).
    fiber_collisions : fiber-collision calculator, optional
        Correction inserted between theory and window; its static kernel is
        folded INTO the window matrix at initialization (reference
        window.py:428-438), so the per-eval cost is unchanged.
    systematic_templates : templates spec, optional
        Additive post-window templates with linear amplitude parameters
        (dict name -> template, sequence, callable(k), flat or per-ell
        arrays; reference window.py:1253-1361). Amplitudes are exactly
        marginalizable.
    """

    _static_linear_solved = ('syst_*',)

    @staticmethod
    def _params(init):
        return _template_params(init)

    def initialize(self, klim=None, k=None, ells=None, wmatrix=None, theory=None,
                   kin=None, kinrebin=None, ellsin=None,
                   kinlim=None, shotnoise=0., fiber_collisions=None, systematic_templates=None):
        if theory is None:
            from ..theories.full_shape import KaiserTracerPowerSpectrumMultipoles
            theory = KaiserTracerPowerSpectrumMultipoles()
        self.theory = theory
        self._klim_input = dict(klim) if klim is not None else None
        self._wshotnoise = None

        # external window-matrix formats (pypower BaseMatrix-style objects,
        # their .npy state dicts, or our canonical dict): the matrix defines
        # the output k grids (rebinned/sliced to klim) and the input theory
        # grid (reference window.py:356-426)
        from ..interop import is_path as _is_path
        external = wmatrix is not None and (
            _is_path(wmatrix)
            or (isinstance(wmatrix, dict) and ('matrix' in wmatrix or 'value' in wmatrix))
            or (not isinstance(wmatrix, (dict, tuple, list)) and hasattr(wmatrix, 'value')))
        if external:
            from ..interop import read_window_matrix
            if klim is not None:
                out_ells = tuple(sorted(klim.keys()))
            elif ells is not None:
                out_ells = tuple(ells)
            else:
                raise ValueError('pass klim= or ells= with an external window matrix')
            kout = None
            if k is not None:
                # a measured data grid fixes the output bins: the matrix is
                # rebinned/sliced to match it exactly
                kout = [np.asarray(kk, dtype='f8') for kk in (k if np.ndim(k[0]) else [k] * len(out_ells))]
            self.kin, self.wmatrix, self.k, self.ellsin, self._wshotnoise = read_window_matrix(
                wmatrix, ells=out_ells, klim=klim, kout=kout, kin=kin, kinrebin=kinrebin,
                kinlim=kinlim, ellsin=ellsin)
            self.ells = out_ells
            self.kedges = []
            for kk in self.k:
                edges = np.concatenate([[kk[0] - (kk[1] - kk[0]) / 2.],
                                        (kk[1:] + kk[:-1]) / 2.,
                                        [kk[-1] + (kk[-1] - kk[-2]) / 2.]])
                self.kedges.append(np.column_stack([edges[:-1], edges[1:]]))
            self.shotnoise = float(shotnoise)
            self.theory.init.update(k=self.kin, ells=self.ellsin)
            self._compose(fiber_collisions, systematic_templates)
            return

        self.ellsin = None  # set to self.ells below

        # resolve output grids
        if klim is not None:
            self.ells = tuple(sorted(klim.keys()))
            self.kedges, self.k = [], []
            for ell in self.ells:
                lim = klim[ell]
                step = lim[2] if len(lim) > 2 else 0.005
                edges = np.arange(lim[0], lim[1] + step / 2., step)
                self.kedges.append(np.column_stack([edges[:-1], edges[1:]]))
                self.k.append((edges[:-1] + edges[1:]) / 2.)
        else:
            if k is None:
                k = np.linspace(0.01, 0.2, 39)
            if ells is None:
                ells = (0, 2, 4)
            self.ells = tuple(ells)
            k = [np.asarray(k, dtype='f8')] * len(self.ells) if np.ndim(k[0]) == 0 else [np.asarray(kk) for kk in k]
            self.k = k
            self.kedges = []
            for kk in self.k:
                edges = np.concatenate([[kk[0] - (kk[1] - kk[0]) / 2.],
                                        (kk[1:] + kk[:-1]) / 2.,
                                        [kk[-1] + (kk[-1] - kk[-2]) / 2.]])
                self.kedges.append(np.column_stack([edges[:-1], edges[1:]]))

        self.shotnoise = float(shotnoise)
        self._set_matrix(wmatrix, kinlim)
        self.ellsin = self.ells
        self.theory.init.update(k=self.kin, ells=self.ells)
        self._compose(fiber_collisions, systematic_templates)

    def _compose(self, fiber_collisions, systematic_templates):
        """Fold a fiber-collision kernel into the window matrix (static
        matrix product + additive offset) and prepare post-window systematic
        templates; per-eval cost stays one matmul."""
        self._offset = None
        if fiber_collisions is not None:
            fiber_collisions.init.update(k=self.kin, ells=self.ellsin, theory=self.theory)
            fiber_collisions.runtime_info.initialize()
            K = np.block([[np.asarray(fiber_collisions.kernel_correlated[io, ii])
                           for ii in range(len(fiber_collisions.ellsin))]
                          for io in range(len(fiber_collisions.ells))])
            if fiber_collisions.with_uncorrelated:
                self._offset = np.asarray(self.wmatrix) @ fiber_collisions.kernel_uncorrelated.reshape(-1)
            self.wmatrix = np.asarray(self.wmatrix) @ K
            self.kin = np.asarray(fiber_collisions.kin)
            self.ellsin = tuple(fiber_collisions.ellsin)
            self.theory.init.update(k=self.kin, ells=self.ellsin)
        self._template_param_names = _template_names(systematic_templates)
        self._templates = (_flat_templates(systematic_templates, self.k)
                           if self._template_param_names else None)

    def _add_corrections(self, flat, params):
        if self._offset is not None:
            flat = flat + jnp.asarray(self._offset, dtype=flat.dtype)
        if self._templates is not None:
            amps = jnp.stack([jnp.asarray(params.get(name, 0.)) for name in self._template_param_names])
            flat = flat + amps @ jnp.asarray(self._templates, dtype=flat.dtype)
        return flat

    def _set_matrix(self, wmatrix, kinlim):
        if wmatrix is None:
            # direct evaluation on volume-weighted bin centers
            xin, full = window_matrix_bininteg([e for e in self.kedges], resolution=1)
            self.kin = xin
            self.wmatrix = full
        elif isinstance(wmatrix, dict) and 'resolution' in wmatrix:
            xin, full = window_matrix_bininteg([e for e in self.kedges], resolution=int(wmatrix['resolution']))
            self.kin = xin
            self.wmatrix = full
        elif isinstance(wmatrix, (tuple, list)) and len(wmatrix) == 2:
            kin, matrix = wmatrix
            self.kin = np.asarray(kin, dtype='f8')
            matrix = np.asarray(matrix, dtype='f8')
            nout = sum(len(kk) for kk in self.k)
            if matrix.shape[0] != nout:
                raise ValueError('window matrix rows {} != data size {}'.format(matrix.shape[0], nout))
            self.wmatrix = matrix
            if kinlim is not None:
                mask = (self.kin >= kinlim[0]) & (self.kin <= kinlim[1])
                self.kin = self.kin[mask]
                nells_in = matrix.shape[1] // mask.size
                fullmask = np.tile(mask, nells_in)
                self.wmatrix = matrix[:, fullmask]
        else:
            raise ValueError('unsupported wmatrix specification: {}'.format(type(wmatrix)))

    def calculate(self, **params):
        theory = self.theory.power
        if self._wshotnoise is not None:
            # measured window response to a constant (shot-noise) input
            # (reference wshotnoise, window.py:445-457): convolve the bare
            # theory, then subtract sn * (delta_l0 - Wsn) from the output
            flat = theory.reshape(-1)
            self.flatpower = jnp.asarray(self.wmatrix, dtype=flat.dtype) @ flat
            if self.shotnoise:
                base = np.concatenate([np.full(len(kk), float(ell == 0))
                                       for ell, kk in zip(self.ells, self.k)])
                self.flatpower = self.flatpower - self.shotnoise * jnp.asarray(base - self._wshotnoise)
            self.flatpower = self._add_corrections(self.flatpower, params)
            return
        has0 = 0 in self.ellsin
        i0 = self.ellsin.index(0) if has0 else 0
        if self.shotnoise and has0:
            # add shot noise to the monopole row (ells may come unsorted
            # through the k=/ells= branch: do NOT assume the monopole is row 0)
            theory = theory.at[i0].add(self.shotnoise)
        flat = theory.reshape(-1)
        self.flatpower = jnp.asarray(self.wmatrix, dtype=flat.dtype) @ flat
        if self.shotnoise and 0 in self.ells:
            # subtract shot noise from the windowed monopole block
            j0 = self.ells.index(0)
            start = sum(len(self.k[i]) for i in range(j0))
            n0 = len(self.k[j0])
            offset = jnp.zeros_like(self.flatpower).at[start:start + n0].add(self.shotnoise)
            self.flatpower = self.flatpower - offset
        self.flatpower = self._add_corrections(self.flatpower, params)

    @property
    def power(self):
        """Windowed multipoles, list of (nk_ell,) arrays."""
        out, start = [], 0
        for kk in self.k:
            out.append(self.flatpower[start:start + len(kk)])
            start += len(kk)
        return out

    def get(self):
        return self.flatpower


class WindowedCorrelationFunctionMultipoles(Calculator):
    """Window-convolved (binned) theory xi_l(s) (reference window.py:536).

    ``fiber_collisions`` (a *CorrelationFunctionMultipoles collision
    calculator) is folded into the bin-integration matrix at initialization
    (the s-space kernel is diagonal, reference window.py:680-705);
    ``systematic_templates`` adds post-window templates with exactly
    marginalizable linear amplitudes (reference window.py:1363)."""

    _static_linear_solved = ('syst_*',)

    @staticmethod
    def _params(init):
        return _template_params(init)

    def initialize(self, slim=None, s=None, ells=None, theory=None, wmatrix=None,
                   fiber_collisions=None, systematic_templates=None):
        if theory is None:
            from ..theories.bao import DampedBAOWigglesTracerCorrelationFunctionMultipoles
            theory = DampedBAOWigglesTracerCorrelationFunctionMultipoles()
        self.theory = theory
        if slim is not None:
            self.ells = tuple(sorted(slim.keys()))
            self.sedges, self.s = [], []
            for ell in self.ells:
                lim = slim[ell]
                step = lim[2] if len(lim) > 2 else 4.
                edges = np.arange(lim[0], lim[1] + step / 2., step)
                self.sedges.append(np.column_stack([edges[:-1], edges[1:]]))
                self.s.append((edges[:-1] + edges[1:]) / 2.)
        else:
            if s is None:
                s = np.linspace(20., 150., 33)
            if ells is None:
                ells = (0, 2)
            self.ells = tuple(ells)
            self.s = [np.asarray(s, dtype='f8')] * len(self.ells)
            self.sedges = []
            for ss in self.s:
                edges = np.concatenate([[ss[0] - (ss[1] - ss[0]) / 2.], (ss[1:] + ss[:-1]) / 2.,
                                        [ss[-1] + (ss[-1] - ss[-2]) / 2.]])
                self.sedges.append(np.column_stack([edges[:-1], edges[1:]]))
        if isinstance(wmatrix, dict) and 'wcounts' in wmatrix:
            # RR-count window: measured RR(s, mu) weights the mu projection
            self.ellsin = tuple(wmatrix.get('ellsin', (0, 2, 4)))
            xin, full = window_matrix_RR(dict(zip(self.ells, self.sedges)),
                                         wmatrix['sedges'], wmatrix['muedges'],
                                         wmatrix['wcounts'], ellsin=self.ellsin,
                                         resolution=int(wmatrix.get('resolution', 1)))
        else:
            xin, full = window_matrix_bininteg([e for e in self.sedges], resolution=3)
            self.ellsin = self.ells
        self.sin = xin
        self.wmatrix = full
        self.theory.init.update(s=self.sin, ells=self.ellsin)

        self._offset = None
        if fiber_collisions is not None:
            fiber_collisions.init.update(s=self.sin, ells=self.ellsin, theory=self.theory)
            fiber_collisions.runtime_info.initialize()
            # s-space collision kernels are diagonal: expand to block-diag
            # and fold into the bin-integration matrix (one-time, host-side)
            K = np.block([[np.diag(np.asarray(fiber_collisions.kernel_correlated[io, ii]))
                           for ii in range(len(fiber_collisions.ellsin))]
                          for io in range(len(fiber_collisions.ells))])
            if fiber_collisions.with_uncorrelated:
                self._offset = np.asarray(self.wmatrix) @ fiber_collisions.kernel_uncorrelated.reshape(-1)
            self.wmatrix = np.asarray(self.wmatrix) @ K
            self.ellsin = tuple(fiber_collisions.ellsin)
            self.theory.init.update(s=self.sin, ells=self.ellsin)
        self._template_param_names = _template_names(systematic_templates)
        self._templates = (_flat_templates(systematic_templates, self.s)
                           if self._template_param_names else None)

    def calculate(self, **params):
        flat = self.theory.corr.reshape(-1)
        self.flatcorr = jnp.asarray(self.wmatrix, dtype=flat.dtype) @ flat
        if self._offset is not None:
            self.flatcorr = self.flatcorr + jnp.asarray(self._offset, dtype=flat.dtype)
        if self._templates is not None:
            amps = jnp.stack([jnp.asarray(params.get(name, 0.)) for name in self._template_param_names])
            self.flatcorr = self.flatcorr + amps @ jnp.asarray(self._templates, dtype=flat.dtype)

    @property
    def corr(self):
        out, start = [], 0
        for ss in self.s:
            out.append(self.flatcorr[start:start + len(ss)])
            start += len(ss)
        return out

    def get(self):
        return self.flatcorr
