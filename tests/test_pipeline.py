"""End-to-end pipeline tests vs the NumPy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle
from octproz_tpu import (AcqParams, FpnMode, Interpolation, ProcConfig,
                         WindowType, curves, initial_fpn_state, make_step)
from octproz_tpu.models import FdOctModel


ACQ = AcqParams(samples_per_line=128, ascans_per_bscan=36,
                bscans_per_buffer=4, bit_depth=12)


def make_raw(rng, acq=ACQ, structured=True):
    shape = acq.buffer_shape
    if structured:
        # synthetic interferogram: DC + a few fringe frequencies + noise
        n = acq.samples_per_line
        k = np.arange(n)
        fringes = (800 + 300 * np.sin(2 * np.pi * 9.5 * k / n)
                   + 200 * np.sin(2 * np.pi * 23.0 * k / n + 0.7))
        raw = fringes[None, None, :] + rng.normal(0, 30, shape)
        return np.clip(raw, 0, 4095).astype(np.uint16)
    return rng.integers(0, 4095, size=shape, dtype=np.uint16)


def run_both(rng, cfg, acq=ACQ, resample_coeffs=(0.0, 0.0, 0.0, 0.0),
             dispersion_coeffs=(0.0, 0.0, 0.0, 0.0), n_buffers=1):
    """Run the jitted pipeline and the oracle on the same raw buffers."""
    cv = curves.make_curves(acq, cfg, resample_coeffs=resample_coeffs,
                            dispersion_coeffs=dispersion_coeffs,
                            window_type=WindowType.HANNING)
    step = make_step(acq, cfg)
    state = initial_fpn_state(acq)

    curve_np = (np.asarray(cv.resample_curve) if cfg.resampling else None)
    window_np = (np.asarray(cv.window) if cfg.windowing else None)
    phase_np = (np.asarray(cv.phase) if cfg.dispersion else None)

    fpn_lines = (min(cfg.bscans_for_noise, acq.bscans_per_buffer) * acq.ascans_per_bscan
                 if cfg.fpn_mode != FpnMode.OFF else 0)

    outs, wants = [], []
    fpn_mean = None
    for _ in range(n_buffers):
        raw = make_raw(rng, acq)
        got, state = step(jnp.asarray(raw), cv, state)
        outs.append(np.asarray(got))

        want, mean = oracle.full_pipeline(
            raw, acq.bit_depth,
            bitshift=cfg.bitshift,
            background_window=(cfg.rolling_average_window if cfg.background_removal else None),
            resample_curve=curve_np,
            interpolation=cfg.interpolation.value,
            window=window_np, phase=phase_np,
            fpn_lines=fpn_lines,
            fpn_mean=(fpn_mean if cfg.fpn_mode == FpnMode.ONCE else None),
            log_scaling=cfg.log_scaling,
            gmin=cfg.grayscale_min, gmax=cfg.grayscale_max,
            addend=cfg.addend, coeff=cfg.multiplicator,
            flip=cfg.bscan_flip, sinusoidal=cfg.sinusoidal_correction,
        )
        if fpn_mean is None:
            # oracle computes the mean line on the full-width complex lines;
            # keep it for the ONCE semantics of subsequent buffers
            fpn_mean = mean
        wants.append(want)
    return outs, wants


class TestMinimalChain:
    def test_ifft_log_only(self, rng):
        cfg = ProcConfig(log_scaling=True)
        outs, wants = run_both(rng, cfg)
        np.testing.assert_allclose(outs[0], wants[0], rtol=1e-3, atol=1e-3)

    def test_linear_scaling(self, rng):
        cfg = ProcConfig(log_scaling=False, grayscale_max=2000.0)
        outs, wants = run_both(rng, cfg)
        np.testing.assert_allclose(outs[0], wants[0], rtol=1e-3, atol=1e-4)


class TestLinearChain:
    def test_klin_window_dispersion(self, rng):
        cfg = ProcConfig(resampling=True, interpolation=Interpolation.LINEAR,
                         windowing=True, dispersion=True)
        outs, wants = run_both(rng, cfg,
                               resample_coeffs=(0.0, 127.0, 8.0, -4.0),
                               dispersion_coeffs=(0.0, 0.0, 20.0, 0.0))
        np.testing.assert_allclose(outs[0], wants[0], rtol=5e-3, atol=5e-3)


class TestFullChain:
    @pytest.mark.parametrize("interp", [Interpolation.CUBIC, Interpolation.LINEAR])
    def test_benchmark_config(self, rng, interp):
        # the reference's benchmark chain: cubic k-lin + disp + window + FPN + log
        cfg = ProcConfig(resampling=True, interpolation=interp,
                         windowing=True, dispersion=True,
                         fpn_mode=FpnMode.ONCE, bscans_for_noise=4,
                         log_scaling=True)
        outs, wants = run_both(rng, cfg,
                               resample_coeffs=(0.0, 127.0, 6.0, -3.0),
                               dispersion_coeffs=(0.0, 0.0, 15.0, 5.0),
                               n_buffers=2)
        for got, want in zip(outs, wants):
            np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    def test_everything_on(self, rng):
        cfg = ProcConfig(bitshift=True,
                         background_removal=True, rolling_average_window=16,
                         resampling=True, interpolation=Interpolation.CUBIC,
                         windowing=True, dispersion=True,
                         fpn_mode=FpnMode.CONTINUOUS, bscans_for_noise=4,
                         log_scaling=True, bscan_flip=True,
                         sinusoidal_correction=True)
        outs, wants = run_both(rng, cfg,
                               resample_coeffs=(0.0, 127.0, 6.0, -3.0),
                               dispersion_coeffs=(0.0, 0.0, 15.0, 5.0))
        np.testing.assert_allclose(outs[0], wants[0], rtol=1e-2, atol=1e-2)


class TestFpnStateSemantics:
    def test_once_reuses_first_mean(self, rng):
        cfg = ProcConfig(fpn_mode=FpnMode.ONCE, bscans_for_noise=4)
        acq = ACQ
        cv = curves.make_curves(acq, cfg)
        step = make_step(acq, cfg)
        state = initial_fpn_state(acq)

        raw1, raw2 = make_raw(rng, acq), make_raw(rng, acq)
        _, state1 = step(jnp.asarray(raw1), cv, state)
        assert bool(state1.determined)
        mean1 = np.asarray(state1.mean_line)
        _, state2 = step(jnp.asarray(raw2), cv, state1)
        np.testing.assert_array_equal(np.asarray(state2.mean_line), mean1)

    def test_continuous_updates_mean(self, rng):
        cfg = ProcConfig(fpn_mode=FpnMode.CONTINUOUS, bscans_for_noise=4)
        cv = curves.make_curves(ACQ, cfg)
        step = make_step(ACQ, cfg)
        state = initial_fpn_state(ACQ)
        _, state1 = step(jnp.asarray(make_raw(rng, ACQ)), cv, state)
        _, state2 = step(jnp.asarray(make_raw(rng, ACQ)), cv, state1)
        assert not np.array_equal(np.asarray(state1.mean_line), np.asarray(state2.mean_line))

    def test_redetermine_resets(self, rng):
        cfg = ProcConfig(fpn_mode=FpnMode.ONCE, bscans_for_noise=4)
        model = FdOctModel(ACQ, cfg)
        model.process_buffer(make_raw(rng, ACQ))
        m1 = np.asarray(model.fpn_state.mean_line)
        model.redetermine_fpn()
        model.process_buffer(make_raw(rng, ACQ))
        m2 = np.asarray(model.fpn_state.mean_line)
        assert not np.array_equal(m1, m2)


class TestRfftPath:
    def test_real_path_matches_c2c(self, rng):
        """Dispersion off -> RFFT shortcut; must equal a C2C pipeline."""
        cfg_real = ProcConfig(resampling=True, windowing=True, dispersion=False)
        # emulate the C2C path by using a unity phasor (phase with zero coeffs)
        cfg_c2c = ProcConfig(resampling=True, windowing=True, dispersion=True)
        cv_real = curves.make_curves(ACQ, cfg_real, resample_coeffs=(0, 127, 4, 0))
        cv_c2c = curves.make_curves(ACQ, cfg_c2c, resample_coeffs=(0, 127, 4, 0),
                                    dispersion_coeffs=(0, 0, 0, 0))
        raw = make_raw(rng, ACQ)
        out_real, _ = make_step(ACQ, cfg_real)(jnp.asarray(raw), cv_real, initial_fpn_state(ACQ))
        out_c2c, _ = make_step(ACQ, cfg_c2c)(jnp.asarray(raw), cv_c2c, initial_fpn_state(ACQ))
        np.testing.assert_allclose(np.asarray(out_real), np.asarray(out_c2c),
                                   rtol=1e-3, atol=1e-3)


class TestModel:
    def test_multi_buffer_volume(self, rng):
        acq = AcqParams(samples_per_line=128, ascans_per_bscan=36,
                        bscans_per_buffer=4, buffers_per_volume=2, bit_depth=12)
        cfg = ProcConfig(resampling=True, interpolation=Interpolation.CUBIC,
                         windowing=True)
        model = FdOctModel(acq, cfg, resample_coeffs=(0, 127, 0, 0))
        vol = np.stack([make_raw(rng, acq), make_raw(rng, acq)])
        out = model.process_volume(vol)
        assert out.shape == (8, 36, 64)

    def test_live_retuning_no_recompile(self, rng):
        cfg = ProcConfig(resampling=True, windowing=True, dispersion=True)
        model = FdOctModel(ACQ, cfg, resample_coeffs=(0, 127, 0, 0))
        raw = make_raw(rng, ACQ)
        out1 = np.asarray(model.process_buffer(raw))
        model.set_dispersion_coeffs(0.0, 0.0, 30.0, 0.0)
        out2 = np.asarray(model.process_buffer(raw))
        assert not np.allclose(out1, out2)  # retuning changed the output
        model.set_klin_coeffs(0.0, 127.0, 10.0, 0.0)
        out3 = np.asarray(model.process_buffer(raw))
        assert not np.allclose(out2, out3)


class TestScanStep:
    def test_matches_sequential_steps(self, rng):
        """make_scan_step over a stacked batch == repeated make_step calls,
        including the carried FPN state (determine-once across buffers)."""
        import jax.numpy as jnp
        from octproz_tpu.pipeline import make_scan_step

        cfg = ProcConfig(bitshift=True, resampling=True,
                         interpolation=Interpolation.CUBIC, windowing=True,
                         dispersion=True, fpn_mode=FpnMode.ONCE,
                         bscans_for_noise=2, log_scaling=True,
                         fft_via_matmul=True)
        cv = curves.make_curves(
            ACQ, cfg, resample_coeffs=(0.0, ACQ.samples_per_line - 1.0, 5.0, 0.0),
            dispersion_coeffs=(0.0, 0.0, 6.0, 0.0),
            window_type=WindowType.HANNING)
        raws = np.stack([make_raw(rng, ACQ) for _ in range(3)])

        step = make_step(ACQ, cfg)
        state = initial_fpn_state(ACQ)
        seq = []
        for i in range(3):
            out, state = step(jnp.asarray(raws[i]), cv, state)
            seq.append(np.asarray(out))

        scan_step = make_scan_step(ACQ, cfg)
        outs, scan_state = scan_step(jnp.asarray(raws), cv, initial_fpn_state(ACQ))
        outs = np.asarray(outs)

        assert outs.shape == (3,) + seq[0].shape
        for i in range(3):
            np.testing.assert_allclose(outs[i], seq[i], atol=2e-5)
        np.testing.assert_allclose(np.asarray(scan_state.mean_line),
                                   np.asarray(state.mean_line), atol=1e-6)
        assert bool(scan_state.determined)
