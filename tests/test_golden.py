"""Golden regression: the full pipeline on a fixed deterministic input must
keep producing the same B-scans.

The reference's quality assurance is comparison against a recorded dataset
(SURVEY.md section 4); without network access to the figshare volume, we
freeze our own golden: a deterministic synthetic interferogram through the
full benchmark chain, with summary statistics and probe pixels pinned.  Any
numerics change (intended or not) shows up here first; update the constants
deliberately when the change is intended and note why.
"""

import dataclasses

import numpy as np
import pytest

from octproz_tpu import AcqParams, FpnMode, Interpolation, ProcConfig
from octproz_tpu import curves as curves_mod, pipeline
from octproz_tpu.params import WindowType


ACQ = AcqParams(samples_per_line=256, ascans_per_bscan=32, bscans_per_buffer=4,
                buffers_per_volume=1, bit_depth=12)


def _golden_raw():
    """Deterministic multi-reflector interferogram with per-line variation."""
    n = ACQ.samples_per_line
    x = np.arange(n)
    lines = []
    for j in range(ACQ.ascans_per_buffer):
        s = (1800.0
             + 600.0 * np.cos(2 * np.pi * 30 * x / n + 0.01 * j)
             + 300.0 * np.cos(2 * np.pi * 70 * x / n)
             + 100.0 * np.cos(2 * np.pi * (5 + 0.02 * j) * x / n))
        lines.append(s)
    raw = np.stack(lines).reshape(ACQ.buffer_shape)
    return np.clip(raw, 0, 4095).astype(np.uint16)


CFG = ProcConfig(bitshift=False, background_removal=True,
                 rolling_average_window=32, resampling=True,
                 interpolation=Interpolation.CUBIC, windowing=True,
                 dispersion=True, fpn_mode=FpnMode.ONCE, bscans_for_noise=4,
                 log_scaling=True)
KW = dict(resample_coeffs=(0.0, 255.0, 8.0, -3.0),
          dispersion_coeffs=(0.0, 0.0, 6.0, 0.0),
          window_type=WindowType.HANNING)

# Frozen 2026-08-17 (first complete pipeline).  mean/std over the whole
# buffer, plus two probe pixels away from peaks and one on the strongest
# reflector.  Tolerances allow compiler/platform jitter but not numerics
# changes.
GOLDEN = {
    "mean": -0.102796, "std": 0.318154,
    "peak_bin": 30,       # strongest reflector past the DC/low-f region
    "probe_peak": 0.686161,
}


@pytest.mark.parametrize("fold", [False, True])
def test_golden_pipeline(fold):
    cfg = dataclasses.replace(CFG, fft_via_matmul=fold)
    curves = curves_mod.make_curves(ACQ, cfg, **KW)
    state = pipeline.initial_fpn_state(ACQ)
    out, _ = pipeline.process_buffer(_golden_raw(), curves, state, ACQ, cfg)
    out = np.asarray(out)

    assert out.shape == (4, 32, 128)
    line = out[2, 16]
    assert int(np.argmax(line[10:])) + 10 == GOLDEN["peak_bin"]
    np.testing.assert_allclose(out.mean(), GOLDEN["mean"], atol=2e-3)
    np.testing.assert_allclose(out.std(), GOLDEN["std"], atol=2e-3)
    np.testing.assert_allclose(line[GOLDEN["peak_bin"]], GOLDEN["probe_peak"],
                               atol=5e-3)
