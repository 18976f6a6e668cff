import numpy as np
import jax.numpy as jnp
import pytest

from desilike_tpu.theories import (WiggleSplitPowerSpectrumTemplate,
                                   BandVelocityPowerSpectrumTemplate,
                                   TurnOverPowerSpectrumTemplate)


def test_wigglesplit():
    tpl = WiggleSplitPowerSpectrumTemplate(z=1., k=np.geomspace(1e-3, 0.6, 300))
    tpl.pipeline.evaluate({'qbao': 1.0, 'dm': 0., 'df': 1.})
    pk0 = np.asarray(tpl.pk_dd)
    np.testing.assert_allclose(pk0, np.asarray(tpl.pk_dd_fid), rtol=2e-3)
    tpl.pipeline.evaluate({'qbao': 1.05, 'dm': 0., 'df': 1.})
    pk1 = np.asarray(tpl.pk_dd)
    # wiggles moved, broadband preserved: no-wiggle part unchanged
    np.testing.assert_allclose(np.asarray(tpl.pknow_dd), np.asarray(tpl.pknow_dd_fid), rtol=2e-3)
    assert not np.allclose(pk1, pk0, rtol=1e-3)


def test_bandvelocity():
    kp = np.array([0.02, 0.05, 0.1, 0.2])
    tpl = BandVelocityPowerSpectrumTemplate(z=1., kp=kp, k=np.geomspace(5e-3, 0.4, 200))
    names = tpl.pipeline.varied_params.names()
    assert 'dptt0' in names and 'dptt3' in names
    tpl.pipeline.evaluate({'dptt1': 1.2})
    ratio = np.asarray(tpl.pk_dd) / np.asarray(tpl.pk_dd_fid)
    i = np.argmin(np.abs(tpl.k - 0.05))
    assert ratio[i] == pytest.approx(1.2, rel=5e-3)
    j = np.argmin(np.abs(tpl.k - 0.3))
    assert ratio[j] == pytest.approx(1.0, rel=5e-3)


def test_turnover():
    tpl = TurnOverPowerSpectrumTemplate(z=0.5, k=np.geomspace(3e-3, 0.3, 300))
    tpl.pipeline.evaluate({})
    assert 0.005 < tpl.kto_fid < 0.03
    tpl.pipeline.evaluate({'qto': 1.1, 'pto': 1.05})
    pk = np.asarray(tpl.pk_dd)
    imax = np.argmax(pk)
    kto_meas = tpl.k[imax]
    assert kto_meas == pytest.approx(tpl.kto_fid * 1.1, rel=0.08)
    assert float(tpl.DV_times_kTO) == pytest.approx(tpl.DV_fid * tpl.kto_fid * 1.1, rel=1e-5)
