"""Minimal FITS codec (desilike_tpu/io_fits.py): the subset the Planck
products use — image HDUs, BINTABLE HDUs with scalar columns, headers."""

import numpy as np
import pytest

from desilike_tpu import io_fits


def test_image_roundtrip(tmp_path):
    fn = str(tmp_path / 'img.fits')
    a = np.arange(12, dtype='f8').reshape(3, 4)
    b = (np.arange(30, dtype='f4') * 1e-12).reshape(5, 6)
    c = np.arange(7, dtype='i4')
    io_fits.write(fn, [io_fits.Hdu(data=a), io_fits.Hdu(data=b), io_fits.Hdu(data=c)])
    for ext, ref in enumerate((a, b, c)):
        out = io_fits.read(fn, ext=ext)
        assert out.dtype == ref.dtype and out.shape == ref.shape
        assert np.array_equal(out, ref)


def test_bintable_roundtrip(tmp_path):
    fn = str(tmp_path / 'tab.fits')
    cols = {'LMIN': np.arange(15, dtype='i8') * 30 + 2,
            'LMAX': np.arange(15, dtype='i8') * 30 + 31,
            'W': np.linspace(0., 1., 15).astype('f4')}
    io_fits.write(fn, [io_fits.Hdu(columns=cols, header={'SPEC': 'TT'}),
                       io_fits.Hdu(columns={'LMIN': np.array([5])}, header={'SPEC': 'EE'})])
    hdus = io_fits.hdus(fn)
    assert hdus[0].data is None and hdus[0].columns is None  # auto primary
    assert hdus[1].read_header()['SPEC'] == 'TT'
    for name, ref in cols.items():
        out = hdus[1][name]
        assert out.dtype == ref.dtype and np.array_equal(out, ref), name
    assert hdus[2].read_header()['SPEC'] == 'EE'
    # fitsio-compat: ext=0 with empty primary falls through to first data HDU
    assert np.array_equal(io_fits.read(fn, ext=0)['LMAX'], cols['LMAX'])


def test_header_value_types(tmp_path):
    fn = str(tmp_path / 'hdr.fits')
    io_fits.write(fn, [io_fits.Hdu(data=np.zeros(3),
                                   header={'SPEC': 'TE', 'LNORM': 3000,
                                           'SCALE': 1.5e-12, 'GOOD': True})])
    hdr = io_fits.read_header(fn, ext=0)
    assert hdr['SPEC'] == 'TE'
    assert hdr['LNORM'] == 3000 and isinstance(hdr['LNORM'], int)
    assert hdr['SCALE'] == pytest.approx(1.5e-12)
    assert hdr['GOOD'] is True
    assert hdr['BITPIX'] == -64 and hdr['NAXIS1'] == 3


def test_unsupported_column_dtype_raises(tmp_path):
    fn = str(tmp_path / 'bad.fits')
    with pytest.raises(NotImplementedError):
        io_fits.write(fn, [io_fits.Hdu(columns={'C': np.array(['a', 'b'])})])
