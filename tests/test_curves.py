"""Unit tests for LUT generation (octproz_tpu.curves) vs direct math."""

import numpy as np
import pytest

from octproz_tpu import AcqParams, Interpolation, WindowType
from octproz_tpu import curves as C


ACQ = AcqParams(samples_per_line=1024, ascans_per_bscan=512,
                bscans_per_buffer=4, bit_depth=12)


class TestPolynomial:
    def test_identity_curve(self):
        # GUI coeffs (0, N-1, 0, 0) normalize to slope 1 -> identity map
        curve = C.resample_curve(ACQ, 0.0, float(ACQ.samples_per_line - 1), 0.0, 0.0)
        expected = np.clip(np.arange(1024, dtype=np.float32), 0, 1021)
        np.testing.assert_allclose(curve, expected, rtol=1e-6)

    def test_normalization(self):
        # c2 acts at full scale: value at x=N-1 should be c0 + c1 + c2 + c3
        c = C.polynomial_curve(C.normalize_poly_coeffs(1.0, 2.0, 3.0, 4.0, 256), 256)
        assert abs(c[-1] - (1 + 2 + 3 + 4)) < 1e-3
        assert abs(c[0] - 1.0) < 1e-6

    def test_clamp(self):
        curve = C.resample_curve(ACQ, -100.0, 5000.0, 0.0, 0.0)
        assert curve.min() >= 0.0
        assert curve.max() <= ACQ.samples_per_line - 3


class TestWindows:
    N = 1024

    @pytest.mark.parametrize("wtype", list(WindowType))
    def test_range_and_dtype(self, wtype):
        w = C.window_curve(wtype, self.N, 0.5, 1.0)
        assert w.shape == (self.N,)
        assert w.dtype == np.float32
        assert np.all(np.isfinite(w))
        assert w.min() >= -0.1  # flat-top dips slightly below zero
        assert w.max() <= 1.0 + 1e-6

    def test_hanning_center(self):
        w = C.window_curve(WindowType.HANNING, self.N, 0.5, 1.0)
        # peak at the window midpoint, value 1
        assert abs(w.max() - 1.0) < 1e-3
        assert abs(int(np.argmax(w)) - self.N // 2) <= 1

    def test_hanning_formula(self):
        w = C.window_curve(WindowType.HANNING, self.N, 0.5, 1.0)
        width = self.N
        min_pos = self.N // 2 - width // 2
        i = 100
        xi = (i - min_pos) / (width - 1.0)
        assert abs(w[i] - 0.5 * (1 - np.cos(2 * np.pi * xi))) < 1e-6

    def test_zero_outside_support(self):
        w = C.window_curve(WindowType.HANNING, self.N, 0.5, 0.5)
        # fill factor 0.5 -> zero outside central half
        assert w[:255].max() == 0.0
        assert w[770:].max() == 0.0
        assert w[512] > 0.5

    def test_gauss_no_gating(self):
        w = C.window_curve(WindowType.GAUSS, self.N, 0.5, 1.0)
        assert np.all(w > 0.0)  # gauss never hard-zeros
        i = np.arange(self.N)
        xi = ((i - self.N // 2) / (self.N - 1.0)) / 1.0
        np.testing.assert_allclose(w, np.exp(-10.0 * xi**2), rtol=1e-5)

    def test_rectangular(self):
        w = C.window_curve(WindowType.RECTANGULAR, self.N, 0.5, 1.0)
        assert set(np.unique(w)) <= {0.0, 1.0}
        assert w.sum() > 0.9 * self.N

    def test_flattop_peak(self):
        w = C.window_curve(WindowType.FLATTOP, self.N, 0.5, 1.0)
        # 5-term flat-top sums to ~1 at center
        assert abs(w.max() - 1.0) < 1e-2

    def test_off_center(self):
        w = C.window_curve(WindowType.HANNING, self.N, 0.25, 0.5)
        assert abs(int(np.argmax(w)) - self.N // 4) <= 2


class TestDispersionPhase:
    def test_unit_magnitude(self):
        p = C.dispersion_phase(ACQ, 0.0, 10.0, -5.0, 2.0)
        np.testing.assert_allclose(np.abs(p), 1.0, rtol=1e-5)

    def test_direction(self):
        p_fwd = C.dispersion_phase(ACQ, 0.0, 10.0, 0.0, 0.0, direction=1)
        p_bwd = C.dispersion_phase(ACQ, 0.0, 10.0, 0.0, 0.0, direction=-1)
        np.testing.assert_allclose(p_fwd, np.conj(p_bwd), rtol=1e-6)

    def test_zero_coeffs_is_unity(self):
        p = C.dispersion_phase(ACQ, 0.0, 0.0, 0.0, 0.0)
        np.testing.assert_allclose(p, np.ones_like(p), atol=1e-7)


class TestSinusoidalCurve:
    def test_formula(self):
        L = 512
        curve = C.sinusoidal_scan_curve(L)
        k = np.arange(L)
        expected = (L / np.pi) * np.arccos(1 - 2 * k / L)
        np.testing.assert_allclose(curve, expected, rtol=1e-5)
        assert curve[0] == 0.0
        assert curve.max() <= L - 1  # stays in range (see SURVEY notes)


class TestMakeCurves:
    def test_full_config_builds_everything(self):
        from octproz_tpu import ProcConfig, FpnMode
        cfg = ProcConfig(resampling=True, windowing=True, dispersion=True,
                         sinusoidal_correction=True, post_background_removal=True,
                         fpn_mode=FpnMode.ONCE)
        cv = C.make_curves(ACQ, cfg, resample_coeffs=(0, 1023, 0, 0))
        assert cv.resample_matrix.shape == (1024, 1024)
        assert cv.window.shape == (1024,)
        assert cv.phase.shape == (1024,)
        assert cv.sinusoidal_curve.shape == (512,)
        assert cv.post_background.shape == (512,)

    def test_minimal_config_builds_nothing(self):
        from octproz_tpu import ProcConfig
        cv = C.make_curves(ACQ, ProcConfig())
        assert cv.resample_matrix is None
        assert cv.window is None
        assert cv.phase is None

    def test_only_consumed_fields_are_device_arrays(self):
        """The fold configuration consumes only the depth operators; every
        other LUT must stay host-side (numpy) so it is never uploaded."""
        import jax
        import numpy as np
        from octproz_tpu import ProcConfig, FpnMode
        cfg = ProcConfig(resampling=True, windowing=True, dispersion=True,
                         fpn_mode=FpnMode.ONCE, log_scaling=True,
                         fft_via_matmul=True)
        assert C.consumed_fields(cfg) == ("depth_op_re", "depth_op_im")
        cv = C.make_curves(ACQ, cfg, resample_coeffs=(0, 1023, 0, 0))
        assert isinstance(cv.depth_op_re, jax.Array)
        assert isinstance(cv.depth_op_im, jax.Array)
        for host_field in ("resample_curve", "resample_matrix", "window",
                           "phase"):
            assert isinstance(getattr(cv, host_field), np.ndarray), host_field

    def test_consumed_fields_unfused_chain(self):
        from octproz_tpu import ProcConfig, FpnMode
        cfg = ProcConfig(resampling=True, windowing=True, dispersion=True,
                         sinusoidal_correction=True,
                         post_background_removal=True, fpn_mode=FpnMode.ONCE)
        assert C.consumed_fields(cfg) == (
            "resample_matrix", "window", "phase", "sinusoidal_curve",
            "post_background")
