"""Tests for the 1D plot subsystem (PlotWindow1D analog)."""

import numpy as np

from octproz_tpu.viz import (LineStats, cast_raw_line, export_csv, plot_lines,
                             select_line)


def test_line_stats():
    s = LineStats.of(np.array([0.0, 2.0, 4.0]))
    assert s.minimum == 0 and s.maximum == 4 and s.mean == 2
    assert "mean 2" in s.label()


def test_cast_raw_line_bitshift():
    line = np.array([16, 4095], np.uint16)
    np.testing.assert_array_equal(cast_raw_line(line, 12, bitshift=True),
                                  [1.0, 255.0])
    np.testing.assert_array_equal(cast_raw_line(line, 12), [16.0, 4095.0])


def test_select_line_clamps():
    buf = np.arange(24).reshape(2, 3, 4)
    np.testing.assert_array_equal(select_line(buf, 9, 9), buf[1, 2])


def test_export_csv_roundtrip(tmp_path):
    p = export_csv(str(tmp_path / "t.csv"),
                   ("raw", np.array([1.5, 2.5])),
                   ("proc", np.array([0.25])))
    lines = open(p).read().splitlines()
    assert lines[0] == "index;raw;proc"
    assert lines[1] == "0;1.5;0.25"
    assert lines[2] == "1;2.5;"


def test_plot_lines_png(tmp_path):
    raw = 1000 + 500 * np.cos(np.linspace(0, 20, 256))
    proc = np.abs(np.sin(np.linspace(0, 5, 128)))
    p = plot_lines(str(tmp_path / "p.png"), raw_line=raw, processed_line=proc,
                   overlays=[("reference", proc * 0.5)])
    from PIL import Image
    img = Image.open(p)
    assert img.size[0] > 100 and img.size[1] > 100


def test_plot_lines_requires_data(tmp_path):
    import pytest
    with pytest.raises(ValueError):
        plot_lines(str(tmp_path / "x.png"))
