"""Property test: the jitted pipeline matches the float64 NumPy oracle for
RANDOM stage combinations, coefficients, and both fold paths.

The per-stage unit tests pin each op; this sweeps the cross-product the
unit tests cannot (stage interactions, both transform formulations,
lin/log scaling, post stages) on small geometry.  FPN stays OFF: its
minimum-variance argmin is a chaotic discrete choice that flips between
implementations on near-tied variances (see CLAUDE.md) and has its own
dedicated parity tests.
"""

import numpy as np
import pytest

import oracle
from octproz_tpu import curves as curves_mod
from octproz_tpu.params import (AcqParams, FpnMode, Interpolation, ProcConfig,
                                WindowType)
from octproz_tpu.pipeline import initial_fpn_state, make_step

N, ASC, BSC = 128, 16, 4


@pytest.mark.parametrize("seed", range(16))
def test_random_config_matches_oracle(seed):
    rng = np.random.default_rng(seed)

    def flip():
        return bool(rng.integers(0, 2))

    acq = AcqParams(samples_per_line=N, ascans_per_bscan=ASC,
                    bscans_per_buffer=BSC, buffers_per_volume=1,
                    bit_depth=int(rng.choice([8, 12, 16])))
    interp = Interpolation(str(rng.choice(["linear", "quadratic", "cubic",
                                           "lanczos"])))
    cfg = ProcConfig(
        bitshift=flip() and acq.bit_depth == 12,
        background_removal=flip(),
        rolling_average_window=int(rng.integers(2, 17)),
        resampling=flip(), interpolation=interp,
        resample_via_matmul=flip(),
        windowing=flip(), dispersion=flip(),
        fpn_mode=FpnMode.OFF,
        log_scaling=flip(),
        grayscale_min=float(rng.uniform(-5, 1)),
        grayscale_max=float(rng.uniform(40, 80)),
        multiplicator=float(rng.uniform(0.5, 1.5)),
        addend=float(rng.uniform(-0.2, 0.2)),
        bscan_flip=flip(), sinusoidal_correction=flip(),
        post_background_removal=flip(),
        post_background_weight=float(rng.uniform(0.2, 1.0)),
        post_background_offset=float(rng.uniform(-0.05, 0.05)),
        fft_via_matmul=flip(),
        fold_backend=str(rng.choice(["pallas", "xla"])),
    )
    rc = (0.0, float(N - 1), float(rng.uniform(-10, 10)),
          float(rng.uniform(-5, 5)))
    dc = (0.0, float(rng.uniform(-2, 2)), float(rng.uniform(-10, 10)),
          float(rng.uniform(-4, 4)))
    wt = WindowType(str(rng.choice(["hanning", "gauss", "sine",
                                    "rectangular", "flattop"])))
    post_bg = (rng.uniform(0, 0.1, acq.output_ascan_length)
               .astype(np.float32) if cfg.post_background_removal else None)

    curves = curves_mod.make_curves(
        acq, cfg, resample_coeffs=rc, dispersion_coeffs=dc, window_type=wt,
        window_center=float(rng.uniform(0.3, 0.7)),
        window_fill_factor=float(rng.uniform(0.5, 1.0)),
        post_background=post_bg)

    raw = rng.integers(0, 2 ** acq.bit_depth, acq.buffer_shape)
    raw = raw.astype(np.uint8 if acq.bit_depth <= 8 else np.uint16)

    got, _ = make_step(acq, cfg)(raw, curves, initial_fpn_state(acq))
    got = np.asarray(got, np.float64)

    want, _ = oracle.full_pipeline(
        raw, acq.bit_depth, bitshift=cfg.bitshift,
        background_window=(cfg.rolling_average_window
                           if cfg.background_removal else None),
        resample_curve=(np.asarray(curves.resample_curve)
                        if cfg.resampling else None),
        interpolation=cfg.interpolation.value,
        window=(np.asarray(curves.window) if cfg.windowing else None),
        phase=(np.asarray(curves.phase) if cfg.dispersion else None),
        log_scaling=cfg.log_scaling, gmin=cfg.grayscale_min,
        gmax=cfg.grayscale_max, addend=cfg.addend, coeff=cfg.multiplicator,
        flip=cfg.bscan_flip, sinusoidal=cfg.sinusoidal_correction,
        post_bg=post_bg, post_bg_weight=cfg.post_background_weight,
        post_bg_offset=cfg.post_background_offset)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3,
                               err_msg=f"seed={seed} cfg={cfg}")
