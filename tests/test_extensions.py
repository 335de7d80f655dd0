"""Tests for the bundled extension ecosystem: statistics, signal monitor,
peak detection, axial PSF fitting, dispersion estimation, k-lin phase
extraction, socket streaming."""

import json
import socket
import time

import numpy as np
import pytest

from octproz_tpu import AcqParams, Interpolation, ProcConfig, curves as curves_mod
from octproz_tpu.extensions import (
    AxialPsfAnalyzerExtension, DispersionEstimator, ImageStatisticsExtension,
    PeakDetectorExtension, SignalMonitorExtension, SocketStreamServer,
    estimate_dispersion_coeffs, extract_klin_curve,
)
from octproz_tpu.extensions.peaks import find_peaks, fit_axial_psf
from octproz_tpu.extensions.socketstream import read_frame
from octproz_tpu.params import WindowType
from octproz_tpu.plugins import MessageBus, Plugin


# ---------------------------------------------------------------------------
# statistics
# ---------------------------------------------------------------------------

def test_image_statistics():
    ext = ImageStatisticsExtension(n_bins=16)
    ext.activate()
    buf = np.full((2, 4, 8), 100, np.uint16)
    buf[0, 0, 0] = 4095
    ext.processed_data_received(buf, 12, 8, 4, 2, 1, 0)
    s = ext.last
    assert s.maximum == 4095 and s.minimum == 100
    assert s.histogram.sum() == buf.size
    assert s.histogram[-1] == 1  # one full-scale sample in the last bin


def test_signal_monitor_saturation():
    ext = SignalMonitorExtension()
    buf = np.zeros((1, 2, 100), np.uint16)
    buf[0, 0, :10] = 255  # 10 saturated of 200 at 8 bit
    ext.raw_data_received(buf, 8, 100, 2, 1, 1, 0)
    assert ext.last.saturation_fraction == pytest.approx(0.05)
    assert ext.last.zero_fraction == pytest.approx(0.95)


# ---------------------------------------------------------------------------
# peaks / PSF
# ---------------------------------------------------------------------------

def _gaussian_line(n=256, center=100.3, sigma=3.0, amp=1.0, floor=0.01):
    x = np.arange(n)
    return floor + amp * np.exp(-0.5 * ((x - center) / sigma) ** 2)


def test_find_peaks_subpixel_and_fwhm():
    line = _gaussian_line()
    peaks = find_peaks(line, threshold=0.1)
    assert len(peaks) == 1
    p = peaks[0]
    assert abs(p.subpixel_index - 100.3) < 0.2
    expected_fwhm = 2 * np.sqrt(2 * np.log(2)) * 3.0
    assert abs(p.fwhm - expected_fwhm) < 0.5


def test_find_peaks_multiple_ordered_by_strength():
    # the STRONGER peak sits at the HIGHER index, so index-sorted output
    # would fail the strongest-first ordering assertion
    line = _gaussian_line(amp=0.5) + _gaussian_line(center=180.0, sigma=2.0,
                                                    amp=1.0, floor=0.0)
    peaks = find_peaks(line, threshold=0.1, max_peaks=4)
    assert len(peaks) == 2
    assert peaks[0].value > peaks[1].value        # strongest first
    assert abs(peaks[0].subpixel_index - 180.0) < 0.5
    assert abs(peaks[1].subpixel_index - 100.3) < 0.5


def test_fit_axial_psf_recovers_sigma():
    line = _gaussian_line(sigma=2.5, floor=1e-4)
    fit = fit_axial_psf(line)
    expected_fwhm = 2 * np.sqrt(2 * np.log(2)) * 2.5
    assert abs(fit.center - 100.3) < 0.1
    assert abs(fit.fwhm - expected_fwhm) < 0.2
    assert fit.r_squared > 0.99


def test_psf_extension_on_stream():
    ext = AxialPsfAnalyzerExtension(bscan=0, ascan=1)
    ext.activate()
    vol = np.tile(_gaussian_line(n=128, center=40.0), (2, 4, 1)).astype(np.float32)
    ext.processed_data_received(vol, 32, 128, 4, 2, 1, 0)
    assert ext.last_fit is not None and abs(ext.last_fit.center - 40.0) < 0.2


def test_peak_detector_extension_integer_input():
    ext = PeakDetectorExtension(bscan=0, ascan=0, threshold=0.05)
    ext.activate()
    vol = (4095 * np.tile(_gaussian_line(n=128, center=64.0), (1, 2, 1))).astype(np.uint16)
    ext.processed_data_received(vol, 12, 128, 2, 1, 1, 0)
    assert len(ext.last_peaks) >= 1
    assert abs(ext.last_peaks[0].subpixel_index - 64.0) < 0.5


# ---------------------------------------------------------------------------
# calibration: dispersion + k-lin extraction
# ---------------------------------------------------------------------------

ACQ = AcqParams(samples_per_line=256, ascans_per_bscan=32, bscans_per_buffer=1,
                buffers_per_volume=1, bit_depth=12)


def _dispersed_raw(d2_true: float, d3_true: float = 0.0, n=256, f=40.0):
    """Real fringes with the polynomial phase error phi_{d2,d3}(x)."""
    phi = np.asarray(curves_mod.polynomial_curve(
        curves_mod.normalize_poly_coeffs(0.0, 0.0, d2_true, d3_true, n), n))
    x = np.arange(n)
    line = 2000 + 1000 * np.cos(2 * np.pi * f * x / n + phi)
    raw = np.tile(line, (1, ACQ.ascans_per_bscan, 1))
    return np.clip(raw, 0, 4095).astype(np.uint16)


def test_estimate_dispersion_finds_compensator():
    d2_true = 40.0
    cfg = ProcConfig(windowing=True, dispersion=True)
    curves = curves_mod.make_curves(ACQ, cfg, window_type=WindowType.HANNING)
    raw = _dispersed_raw(d2_true)
    best_d2, best_d3, metric = estimate_dispersion_coeffs(
        raw, ACQ, cfg, curves, d2_range=(-100, 100), n_grid=41, refine_iters=2)
    # The kept (positive-depth) half of the IFFT holds the conjugate fringe
    # term, which the phasor exp(+i phi_{d2_true}) sharpens -- so the
    # compensator for a sample with quadratic phase error phi_{d2_true} is
    # d2 = +d2_true in this convention (sign flips via the direction factor,
    # cuda_code.cu:624-634).
    assert abs(best_d2 - d2_true) < 5.0
    assert abs(best_d3) < 10.0  # no cubic error present
    assert metric > 0


def test_estimate_dispersion_recovers_d2_and_d3():
    """Full reference-extension capability (docs/docs/plugins.md:18-19):
    recover BOTH a quadratic and a cubic phase error from a synthetic
    chirped interferogram."""
    d2_true, d3_true = 35.0, -25.0
    cfg = ProcConfig(windowing=True, dispersion=True)
    curves = curves_mod.make_curves(ACQ, cfg, window_type=WindowType.HANNING)
    raw = _dispersed_raw(d2_true, d3_true)
    d2, d3, metric = estimate_dispersion_coeffs(
        raw, ACQ, cfg, curves, d2_range=(-100, 100), d3_range=(-100, 100),
        n_grid=41, refine_iters=2)
    assert abs(d2 - d2_true) < 5.0, f"d2={d2}"
    assert abs(d3 - d3_true) < 5.0, f"d3={d3}"
    # the joint estimate must sharpen at least as well as d2-only
    _, _, m_d2only = estimate_dispersion_coeffs(
        raw, ACQ, cfg, curves, d2_range=(-100, 100), estimate_d3=False,
        n_grid=41, refine_iters=2)
    assert metric >= m_d2only


def test_dispersion_estimator_stateful():
    cfg = ProcConfig(windowing=True, dispersion=True)
    curves = curves_mod.make_curves(ACQ, cfg)
    est = DispersionEstimator(ACQ, cfg, curves)
    with pytest.raises(RuntimeError):
        est.estimate()
    est.feed(_dispersed_raw(20.0))
    d2, d3, _ = est.estimate(d2_range=(-60, 60), n_grid=25, refine_iters=1)
    assert abs(d2 - 20.0) < 6.0


def test_extract_klin_curve_linearizes_phase():
    n = 512
    x = np.arange(n, dtype=np.float64)
    # nonlinear wavenumber mapping g(x) (monotone), fringe = cos(2 pi f g/n)
    g = x + 30.0 * np.sin(np.pi * x / n)
    f = 60.0
    spectra = np.cos(2 * np.pi * f * g / n) * 500 + 1000
    curve = extract_klin_curve(spectra)
    assert curve.shape == (n,)
    assert np.all(np.diff(curve) >= -1e-6)  # monotone
    # phase at the resampled positions must be linear in j
    phase_at = 2 * np.pi * f * np.interp(curve, x, g) / n
    interior = slice(10, n - 10)
    fitted = np.polyfit(x[interior], phase_at[interior], 1)
    residual = phase_at[interior] - np.polyval(fitted, x[interior])
    # total phase span is 2*pi*f ~ 377 rad; < 0.15 rad deviation ~ 0.04%
    assert np.abs(residual).max() < 0.15
    # and the raw (uncorrected) mapping is far from linear by comparison
    raw_phase = 2 * np.pi * f * g / n
    raw_fit = np.polyfit(x[interior], raw_phase[interior], 1)
    raw_residual = raw_phase[interior] - np.polyval(raw_fit, x[interior])
    assert np.abs(raw_residual).max() > 10 * np.abs(residual).max()


def test_extract_klin_identity_for_linear_fringe():
    n = 256
    spectra = np.cos(2 * np.pi * 30.0 * np.arange(n) / n)
    curve = extract_klin_curve(spectra)
    interior = slice(10, n - 10)
    np.testing.assert_allclose(curve[interior], np.arange(n)[interior],
                               atol=1.5)


# ---------------------------------------------------------------------------
# socket stream
# ---------------------------------------------------------------------------

class _EchoPlugin(Plugin):
    name = "echo"

    def __init__(self):
        super().__init__()
        self.received = []

    def receive_command(self, sender, command, params):
        self.received.append((sender, command, params))


def test_socket_stream_roundtrip():
    bus = MessageBus()
    echo = _EchoPlugin()
    bus.register(echo)
    srv = SocketStreamServer(bus=bus)
    srv.start()
    try:
        with socket.create_connection((srv.host, srv.port), timeout=5) as s:
            sf = s.makefile("rwb")

            def send(obj):
                sf.write((json.dumps(obj) + "\n").encode())
                sf.flush()

            send({"command": "ping"})
            assert read_frame(sf)["reply"] == "pong"

            send({"command": "subscribe"})
            assert read_frame(sf)["reply"] == "subscribed"

            frame = np.arange(24, dtype=np.uint16).reshape(2, 3, 4)
            srv.processed_data_received(frame, 12, 4, 3, 2, 1, 7)
            msg = read_frame(sf)
            assert msg["type"] == "frame" and msg["buffer_nr"] == 7
            np.testing.assert_array_equal(msg["data"], frame)

            send({"command": "set_gain", "target": "echo", "value": 3})
            assert read_frame(sf)["reply"] == "ok"
            assert echo.received == [("socket-stream", "set_gain", {"value": 3})]

            send({"command": "nonsense", "target": "ghost"})
            assert read_frame(sf)["reply"] == "unknown command"

            sf.write(b"not json\n")
            sf.flush()
            assert "error" in read_frame(sf)
    finally:
        srv.stop()


# ---------------------------------------------------------------------------
# camera (reference Camera plugin analog, docs/docs/plugins.md:22-24)
# ---------------------------------------------------------------------------

def _camera_dir(tmp_path, n=3):
    from PIL import Image

    d = tmp_path / "cam"
    d.mkdir()
    for i in range(n):
        Image.fromarray(np.full((8, 12, 3), 40 * i, np.uint8)).save(
            d / f"f{i}.png")
    return str(d)


def test_directory_camera_cycles_and_snapshots(tmp_path):
    from octproz_tpu.extensions import CameraExtension, DirectoryCamera

    import time as _time

    src = DirectoryCamera(_camera_dir(tmp_path), fps=10.0)
    cam = CameraExtension(src)
    seen = []
    for i in range(4):
        src._t0 = _time.monotonic() - i / src.fps  # advance the frame clock
        f = cam.current_frame()
        assert f.shape == (8, 12, 3) and f.dtype == np.uint8
        seen.append(int(f[0, 0, 0]))
    assert seen == [0, 40, 80, 0]  # cycles through all frames at fps
    snap = cam.snapshot(str(tmp_path / "snap.png"))
    assert snap and np.asarray(__import__("PIL.Image", fromlist=["Image"])
                               .open(snap)).shape == (8, 12, 3)


def test_callable_camera_and_empty_dir(tmp_path):
    from octproz_tpu.extensions import CallableCamera, CameraExtension, \
        DirectoryCamera

    with pytest.raises(ValueError, match="no '\\*.png' frames"):
        DirectoryCamera(str(tmp_path))
    frames = [None, np.ones((4, 4), np.uint8)]
    cam = CameraExtension(CallableCamera(lambda: frames.pop(0)
                                         if frames else None))
    assert cam.current_frame() is None      # nothing yet
    assert cam.current_frame() is not None  # first real frame
    assert cam.current_frame() is not None  # source dry: last frame sticks


def test_live_view_serves_camera_pane(tmp_path):
    import json as _json
    import urllib.request

    from octproz_tpu.extensions import CameraExtension, DirectoryCamera
    from octproz_tpu.viz.live import LiveView

    live = LiveView(port=0, throttle_s=0.0)
    try:
        # no camera attached: 404 + stats flag off
        status, body = _get_live(live, "stats.json")
        assert not _json.loads(body)["camera"]
        try:
            _get_live(live, "camera.png")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        cam = CameraExtension(DirectoryCamera(_camera_dir(tmp_path)))
        live.attach_camera(cam)
        status, body = _get_live(live, "camera.png")
        assert status == 200 and body[:4] == b"\x89PNG"
        _, body = _get_live(live, "stats.json")
        assert _json.loads(body)["camera"]
    finally:
        live.close()


def _get_live(live, path):
    import urllib.request

    with urllib.request.urlopen(live.url + path) as r:
        return r.status, r.read()


def test_socket_stream_survives_non_dict_json_and_stalled_subscriber():
    """A non-dict JSON line gets an error reply (not a dropped connection),
    and a subscriber that stops reading has frames DROPPED while the
    push_frame caller (the engine thread) never blocks."""
    srv = SocketStreamServer(bus=MessageBus())
    srv.start()
    try:
        with socket.create_connection((srv.host, srv.port), timeout=5) as s:
            sf = s.makefile("rwb")
            sf.write(b'[1, 2]\n')
            sf.flush()
            assert "error" in read_frame(sf)
            sf.write((json.dumps({"command": "ping"}) + "\n").encode())
            sf.flush()
            assert read_frame(sf)["reply"] == "pong"  # connection survived

            sf.write((json.dumps({"command": "subscribe"}) + "\n").encode())
            sf.flush()
            assert read_frame(sf)["reply"] == "subscribed"

            # stalled consumer: never read again; push a large frame stream
            frame = np.zeros((64, 64, 256), np.float32)  # 4 MB each
            t0 = time.monotonic()
            for nr in range(20):
                srv.processed_data_received(frame, 32, 256, 64, 64, 1, nr)
            elapsed = time.monotonic() - t0
            # the engine-side push must not block on the full TCP buffer
            assert elapsed < 5.0
            client = srv._server._clients[0]
            assert client.frames_dropped > 0
            assert srv.frames_dropped == client.frames_dropped
    finally:
        srv.stop()


def test_fwhm_interpolates_both_crossings_correctly():
    """Right half-max crossing must interpolate TOWARD the peak (the offset
    is signed); [0, .2, 1, .2, 0] has FWHM 1.25, not 2.0."""
    line = np.array([0.0, 0.2, 1.0, 0.2, 0.0])
    peaks = find_peaks(line)
    assert len(peaks) == 1
    assert peaks[0].fwhm == pytest.approx(1.25, abs=1e-6)
