"""Tests: PhytoOCT-class portable acquisition system (io/phytooct.py).

The device model injects one artifact per processing stage; these tests
assert the stages actually cancel them, plus the producer-thread/ring/
registry integration a hardware port reuses.
"""

import dataclasses

import numpy as np

from octproz_tpu.curves import make_curves
from octproz_tpu.io.phytooct import (PhytoDeviceConfig, PhytoDeviceModel,
                                     PortableOctSystem, make_system, register)
from octproz_tpu.io.systems import SystemRegistry
from octproz_tpu.params import FpnMode, ProcConfig
from octproz_tpu.pipeline import initial_fpn_state, make_step
from octproz_tpu.utils.settings import SettingsManager

SMALL = dict(samples_per_line=256, ascans_per_bscan=64, bscans_per_buffer=2,
             buffers_per_volume=1, exposure_us=0.0, shot_noise=0.0005)


def _process(system, cfg, raw):
    curves = make_curves(system.acq, cfg, **system.curve_kwargs())
    step = make_step(system.acq, cfg)
    out, _ = step(raw, curves, initial_fpn_state(system.acq))
    return np.asarray(out)


def test_frame_format_is_12_in_16_bit():
    model = PhytoDeviceModel(PhytoDeviceConfig(**SMALL))
    frame = model.frame(0)
    assert frame.shape == (64, 256) and frame.dtype == np.uint16
    assert np.all(frame & 0xF == 0)          # left-aligned 12-bit codes
    assert frame.max() > 2048 << 4           # uses the upper code range


def test_klin_curve_inverts_the_spectrometer_warp():
    model = PhytoDeviceModel(PhytoDeviceConfig(**SMALL))
    curve = model.klin_curve()
    assert curve.shape == (256,)
    # strictly monotonic until the [0, N-3] safety clamp (curves.py:76)
    assert np.all(np.diff(curve[:-4]) > 0)
    assert curve.max() == 253.0
    # resampling pixels by the curve yields a uniform wavenumber grid
    v_resampled = np.interp(curve, np.arange(256), model.v)
    lin = np.linspace(model.v[0], model.v[-1], 256)
    assert np.abs(v_resampled[:-4] - lin[:-4]).max() < 1e-3
    # the cubic GUI fit reproduces the exact curve to sub-pixel accuracy
    c = model.klin_coeffs()
    j = np.arange(256) / 256.0
    fit = c[0] + c[1] * j + c[2] * j**2 + c[3] * j**3
    assert np.abs(fit - curve)[:-3].max() < 0.5  # tail is clamp-flattened


def test_calibration_sharpens_the_point_spread():
    """k-lin + dispersion compensation concentrate the reflector energy:
    the calibrated chain must beat the uncalibrated one clearly."""
    sys_ = PortableOctSystem(PhytoDeviceConfig(
        **SMALL, bidirectional=False, surface_tilt=0.0, fpn_strength=0.0,
        k_warp=0.25, surface_depth=0.35, n_layers=0))
    base = dataclasses.replace(sys_.recommended_config(),
        log_scaling=False, fpn_mode=FpnMode.OFF,
        sinusoidal_correction=False, bscan_flip=False)
    raw = sys_.model.buffer(0)

    def concentration(cfg):
        vol = _process(sys_, cfg, raw)
        ascan = vol[0].mean(axis=0)          # average linear A-scan
        peak = int(np.argmax(ascan[4:]) + 4)  # skip DC residue
        win = ascan[max(peak - 3, 0):peak + 4].sum()
        return win / ascan[4:].sum()

    sharp = concentration(base)
    blurred = concentration(dataclasses.replace(base, resampling=False, dispersion=False))
    assert sharp > 1.3 * blurred
    assert sharp > 0.8                        # most energy within +-3 bins


def test_sinusoidal_correction_linearizes_the_tilted_surface():
    """The resonant scanner samples the tilted surface non-uniformly; after
    the acos correction the surface depth must be (close to) linear in the
    A-scan index again."""
    sys_ = PortableOctSystem(PhytoDeviceConfig(
        **SMALL, bidirectional=False, surface_tilt=0.16, n_layers=0,
        fpn_strength=0.0))
    cfg = dataclasses.replace(sys_.recommended_config(), fpn_mode=FpnMode.OFF,
                                            bscan_flip=False)
    raw = sys_.model.buffer(0)

    def surface_residual(cfg):
        vol = _process(sys_, cfg, raw)
        depths = np.argmax(vol[0][:, 4:], axis=1).astype(np.float64)
        a = np.arange(depths.size)
        slope, icept = np.polyfit(a, depths, 1)
        return np.abs(depths - (slope * a + icept)).mean()

    corrected = surface_residual(cfg)
    distorted = surface_residual(dataclasses.replace(cfg, sinusoidal_correction=False))
    assert corrected < 0.6 * distorted


def test_bidirectional_flip_aligns_alternate_bscans():
    sys_ = PortableOctSystem(PhytoDeviceConfig(
        **SMALL, surface_tilt=0.16, n_layers=0, fpn_strength=0.0))
    cfg = dataclasses.replace(sys_.recommended_config(), fpn_mode=FpnMode.OFF,
                                            sinusoidal_correction=False)
    raw = sys_.model.buffer(0)
    vol = _process(sys_, cfg, raw)
    d0 = np.argmax(vol[0][:, 4:], axis=1).astype(np.float64)
    d1 = np.argmax(vol[1][:, 4:], axis=1).astype(np.float64)
    # the flipped (even, backwards-scanned) frame shows the same
    # left->right tilt as the forward odd frame
    assert np.abs(d0 - d1).mean() < 2.0
    vol_noflip = _process(sys_, dataclasses.replace(cfg, bscan_flip=False), raw)
    d0r = np.argmax(vol_noflip[0][:, 4:], axis=1).astype(np.float64)
    assert np.abs(d0r - d1).mean() > 4.0      # without flip they disagree


def test_producer_ring_and_registry_integration(tmp_path):
    reg = SystemRegistry(SettingsManager(str(tmp_path / "s.ini")))
    register(reg)
    assert "phytooct" in reg.names
    reg.store_settings("phytooct", {
        "samples_per_line": "128", "ascans_per_bscan": "16",
        "bscans_per_buffer": "2", "buffers_per_volume": "3",
        "exposure_us": "0.0", "bidirectional": "false"})
    src = reg.activate("phytooct")
    assert isinstance(src, PortableOctSystem)
    assert src.acq.samples_per_line == 128
    assert src.device_cfg.bidirectional is False
    got = list(src.buffers())
    assert len(got) == 3
    assert got[0].shape == (2, 16, 128) and got[0].dtype == np.uint16
    # deterministic device model: re-activation replays the same stream
    np.testing.assert_array_equal(got[1], src.model.buffer(1))
    reg.deactivate()                          # close() joins the producer


def test_make_system_defaults():
    sys_ = make_system({})
    assert sys_.acq.samples_per_line == 1024
    sys_.close()


def test_bidirectional_parity_is_within_buffer():
    """With odd bscans_per_buffer, frame reversal must follow WITHIN-buffer
    parity (what ops.postprocess.bscan_flip un-reverses), not global frame
    parity."""
    cfg = PhytoDeviceConfig(**{**SMALL, "bscans_per_buffer": 3,
                               "surface_tilt": 0.16, "n_layers": 0,
                               "fpn_strength": 0.0})
    model = PhytoDeviceModel(cfg)
    # buffer 1 holds global frames 3,4,5 -> within-buffer 0,1,2
    buf = model.buffer(1)
    fwd = model._ascan_spectrum(model.scan_positions(False), noise_key=4)
    rev = model._ascan_spectrum(model.scan_positions(True), noise_key=3)
    codes = lambda s: (s * 4096.0).astype(np.uint16) << 4
    np.testing.assert_array_equal(buf[0], codes(rev))   # within-index 0: reversed
    np.testing.assert_array_equal(buf[1], codes(fwd))   # within-index 1: forward
