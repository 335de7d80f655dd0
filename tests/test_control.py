"""Live parameter re-tuning surface (SURVEY.md section 3.5 analog).

Covers: ParamController command handling, recompile-free curve re-tuning
mid-stream, static-config swaps, POST /control on the live viewer, command
routing from the socket-stream extension, and the live assembled-volume
render."""

import json
import socket
import urllib.request

import numpy as np
import pytest

from octproz_tpu import AcqParams, FpnMode, Interpolation, ProcConfig
from octproz_tpu.control import ParamController
from octproz_tpu.io.source import SyntheticSource
from octproz_tpu.models.fdoct import FdOctModel
from octproz_tpu.params import WindowType
from octproz_tpu.runtime import StreamingEngine

ACQ = AcqParams(samples_per_line=64, ascans_per_bscan=16, bscans_per_buffer=4,
                buffers_per_volume=2, bit_depth=12)
CFG = ProcConfig(resampling=True, interpolation=Interpolation.LINEAR,
                 windowing=True, dispersion=True, fpn_mode=FpnMode.OFF,
                 log_scaling=True)


def make_model(cfg=CFG):
    return FdOctModel(ACQ, cfg,
                      resample_coeffs=(0.0, ACQ.samples_per_line - 1.0, 0.0, 0.0),
                      dispersion_coeffs=(0.0, 0.0, 4.0, 0.0))


def _raw():
    return np.random.default_rng(0).integers(
        0, 4095, size=ACQ.buffer_shape).astype(np.uint16)


def test_dispersion_change_no_recompile():
    """A mid-stream dispersion change must alter the output WITHOUT swapping
    the compiled step (curves are traced arrays: the dirty-flag LUT re-upload
    analog, cuda_code.cu:1432-1445)."""
    model = make_model()
    ctl = ParamController(model)
    raw = _raw()
    step_before = model._step
    out1 = np.asarray(model.process_buffer(raw))

    assert ctl.handle("set_dispersion_coeffs",
                      {"d0": 0, "d1": 0, "d2": 40.0, "d3": 0}) == {"reply": "ok"}
    assert model._step is step_before          # same executable
    out2 = np.asarray(model.process_buffer(raw))
    assert not np.allclose(out1, out2)         # output actually re-tuned
    assert model._curve_kwargs["dispersion_coeffs"] == (0.0, 0.0, 40.0, 0.0)


def test_klin_window_and_custom_curve_commands():
    model = make_model()
    ctl = ParamController(model)
    assert ctl.handle("set_klin_coeffs",
                      {"coeffs": [0, 63, 5, -2]}) == {"reply": "ok"}
    assert model._curve_kwargs["resample_coeffs"] == (0.0, 63.0, 5.0, -2.0)
    assert ctl.handle("set_window", {"type": "gauss", "center": 0.4,
                                     "fill_factor": 0.9}) == {"reply": "ok"}
    assert model._curve_kwargs["window_type"] == WindowType.GAUSS
    curve = np.linspace(0, ACQ.samples_per_line - 3, ACQ.samples_per_line)
    assert ctl.handle("set_custom_resample_curve",
                      {"values": curve.tolist()}) == {"reply": "ok"}


def test_set_grayscale_swaps_executable():
    model = make_model()
    ctl = ParamController(model)
    step_before = model._step
    out1 = np.asarray(model.process_buffer(_raw()))
    assert ctl.handle("set_grayscale", {"min": 0, "max": 30}) == {"reply": "ok"}
    assert model.cfg.grayscale_max == 30.0
    assert model._step is not step_before      # static field => new executable
    out2 = np.asarray(model.process_buffer(_raw()))
    assert out1.shape == out2.shape


def test_unknown_and_invalid_commands():
    ctl = ParamController(make_model())
    r = ctl.handle("warp_speed", {})
    assert "error" in r and "set_klin_coeffs" in r["commands"]
    r = ctl.handle("set_klin_coeffs", {"coeffs": [1, 2]})
    assert "error" in r
    r = ctl.handle("record_post_background", {"n": 1})
    assert r == {"error": "no engine attached"}


def test_get_params_describes_state():
    ctl = ParamController(make_model())
    d = ctl.handle("get_params", {})["reply"]
    assert d["dispersion_coeffs"] == [0.0, 0.0, 4.0, 0.0]
    assert d["window_type"] == "hanning"
    assert d["fpn_mode"] == "off"


def _post(url, obj):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 method="POST")
    try:
        with urllib.request.urlopen(req, timeout=5) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_live_view_control_endpoint():
    """POST /control re-tunes the running model; /params.json reflects it."""
    from octproz_tpu.viz.live import LiveView

    model = make_model()
    eng = StreamingEngine(model, SyntheticSource(ACQ, n_buffers=4),
                          stream_to_host=True)
    live = LiveView(port=0, throttle_s=0.0)
    live.attach(eng)  # auto-creates the ParamController
    try:
        status, reply = _post(live.url + "control",
                              {"command": "set_dispersion_coeffs", "d2": 25.0})
        assert status == 200 and reply == {"reply": "ok"}
        assert model._curve_kwargs["dispersion_coeffs"] == (0.0, 0.0, 25.0, 0.0)

        with urllib.request.urlopen(live.url + "params.json", timeout=5) as r:
            params = json.loads(r.read())
        assert params["dispersion_coeffs"] == [0.0, 0.0, 25.0, 0.0]

        status, reply = _post(live.url + "control", {"command": "nope"})
        assert status == 400 and "error" in reply

        assert eng.run() == 4  # stream still healthy after re-tuning
    finally:
        live.close()


def test_socketstream_routes_to_controller():
    """{"command": ..., "target": "processing"} over TCP reaches the model
    (plugin request signals analog, plugin.h:82-84)."""
    from octproz_tpu.extensions.socketstream import SocketStreamServer
    from octproz_tpu.plugins import MessageBus

    model = make_model()
    bus = MessageBus()
    ctl = ParamController(model)
    bus.register(ctl)
    srv = SocketStreamServer(port=0, bus=bus)
    srv.start()
    try:
        with socket.create_connection((srv.host, srv.port), timeout=5) as s:
            f = s.makefile("rwb")
            f.write((json.dumps({"command": "set_klin_coeffs",
                                 "target": "processing",
                                 "coeffs": [0, 63, 9, -3]}) + "\n").encode())
            f.flush()
            reply = json.loads(f.readline())
        assert reply == {"reply": "ok"}
        assert model._curve_kwargs["resample_coeffs"] == (0.0, 63.0, 9.0, -3.0)
    finally:
        srv.stop()


def test_live_volume_render_of_assembled_stream():
    """volume_render=True: the assembled multi-buffer volume is raycast into
    /volume.png periodically (updateDisplayedVolume analog)."""
    from octproz_tpu.viz.live import LiveView

    model = make_model()
    eng = StreamingEngine(model, SyntheticSource(ACQ, n_buffers=6),
                          stream_to_host=True)
    live = LiveView(port=0, throttle_s=0.0, volume_render=True,
                    volume_throttle_s=0.0, volume_size=32)
    live.attach(eng)
    try:
        assert eng.assembler is not None  # attach grew one
        assert eng.run() == 6
        assert live.volume_renders >= 1
        with urllib.request.urlopen(live.url + "volume.png", timeout=5) as r:
            body = r.read()
        assert body[:4] == b"\x89PNG"
        with urllib.request.urlopen(live.url + "stats.json", timeout=5) as r:
            stats = json.loads(r.read())
        assert stats.get("volume_renders", 0) >= 1
    finally:
        live.close()


def test_extension_management_commands():
    """Headless ExtensionUIManager analog: list / activate / deactivate."""
    from octproz_tpu.plugins import Extension, ExtensionManager

    class Dummy(Extension):
        name = "dummy"

    mgr = ExtensionManager()
    ext = Dummy()
    mgr.add(ext)
    model = make_model()
    eng = StreamingEngine(model, SyntheticSource(ACQ, n_buffers=1),
                          extensions=mgr)
    ctl = ParamController(model, eng)

    assert ctl.handle("list_extensions", {}) == {"reply": {"dummy": False}}
    assert ctl.handle("activate_extension", {"name": "dummy"}) == {"reply": "ok"}
    assert ext.active
    assert ctl.handle("deactivate_extension", {"name": "dummy"}) == {"reply": "ok"}
    assert not ext.active
    r = ctl.handle("activate_extension", {"name": "nope"})
    assert "error" in r and r["extensions"] == ["dummy"]


def test_live_view_control_rejects_non_dict_body():
    """Valid-JSON non-object bodies get a 400 error reply, not a dropped
    connection with no response."""
    from octproz_tpu.viz.live import LiveView

    model = make_model()
    eng = StreamingEngine(model, SyntheticSource(ACQ, n_buffers=1),
                          stream_to_host=True)
    live = LiveView(port=0, throttle_s=0.0)
    live.attach(eng)
    try:
        status, reply = _post(live.url + "control", "redetermine_fpn")
        assert status == 400 and "error" in reply
    finally:
        live.close()
