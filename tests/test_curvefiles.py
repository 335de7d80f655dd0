"""Tests: curve CSV persistence + demo extension + curve mini-plot."""

import numpy as np
import pytest

from octproz_tpu.io.curvefiles import load_curve_csv, save_curve_csv


def test_csv_roundtrip(tmp_path):
    curve = np.linspace(0, 1020, 256).astype(np.float32)
    p = save_curve_csv(str(tmp_path / "c.csv"), curve)
    back = load_curve_csv(p)
    np.testing.assert_allclose(back, curve, rtol=1e-6)


def test_csv_header_and_comma_decimal(tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("index;value\n0;1,5\n1;2.5\n\n3;9\n")
    curve = load_curve_csv(str(p))
    np.testing.assert_allclose(curve, [1.5, 2.5, 0.0, 9.0])


def test_csv_expected_size_mismatch_raises(tmp_path):
    """A curve recorded for a different geometry must not silently load
    truncated or zero-padded."""
    p = tmp_path / "c.csv"
    p.write_text("0;1\n1;2\n9;99\n")
    with pytest.raises(ValueError, match="10 points.*needs 4"):
        load_curve_csv(str(p), expected_size=4)
    curve = load_curve_csv(str(p), expected_size=10)
    np.testing.assert_allclose(curve[[0, 1, 9]], [1, 2, 99])


def test_csv_errors(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("justonecolumn\n")
    with pytest.raises(ValueError, match="index;value"):
        load_curve_csv(str(p))
    p.write_text("")
    with pytest.raises(ValueError, match="no curve points"):
        load_curve_csv(str(p))


def test_demo_extension_guard_and_command():
    from octproz_tpu.extensions.demo import DemoExtension

    ext = DemoExtension(frame_decimation=2)
    ext.activate()
    buf = np.full((1, 2, 8), 2047, np.uint16)
    for nr in range(4):
        ext.processed_data_received(buf, 12, 8, 2, 1, 1, nr)
    assert ext.frames_seen == 4
    assert ext.average_intensity == pytest.approx(2047 / 4095, rel=1e-3)
    ext.receive_command("test", "set_decimation", {"value": 5})
    assert ext.frame_decimation == 5


def test_plot_curves_png(tmp_path):
    from octproz_tpu.viz import plot_curves

    p = plot_curves(str(tmp_path / "c.png"),
                    [("resampling", np.linspace(0, 255, 256))],
                    reference=np.linspace(0, 255, 256) ** 1.02 / 255 ** 0.02,
                    title="k-linearization")
    from PIL import Image
    assert Image.open(p).size[0] > 100
