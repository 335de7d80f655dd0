"""Visualization tests: PNG/LUT IO and the 7-mode offline raycaster."""

import numpy as np
import pytest

from octproz_tpu.viz import (
    RenderMode, RenderParams, apply_lut, builtin_lut, compute_sample_depths,
    load_lut_png, render_volume, save_bscan_png, save_enface_png, save_png,
)


@pytest.fixture(scope="module")
def volume():
    """(16, 16, 32) volume: a bright slab at depth 10..14, intensity 0.8."""
    v = np.zeros((16, 16, 32), np.float32)
    v[:, :, 10:14] = 0.8
    v[4:8, 4:8, 20:24] = 0.5  # dimmer deeper blob
    return v


def test_png_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((8, 8)).astype(np.float32)
    p = save_png(str(tmp_path / "x.png"), img)
    from PIL import Image
    back = np.asarray(Image.open(p), np.float32) / 255.0
    np.testing.assert_allclose(back, img, atol=1 / 255.0 + 1e-6)


def test_lut_png_roundtrip(tmp_path):
    lut = builtin_lut("fire")
    save_png(str(tmp_path / "lut.png"), lut.reshape(1, -1, 3))
    back = load_lut_png(str(tmp_path / "lut.png"))
    assert back.shape == (256, 3)
    np.testing.assert_allclose(back, lut, atol=1 / 255.0 + 1e-6)


@pytest.mark.parametrize("name", ["gray", "fire", "hotter", "ice", "blue",
                                  "deep_blue", "deep_red", "six_shades",
                                  "sixteen_colors", "depth_colors"])
def test_builtin_luts(name):
    lut = builtin_lut(name)
    assert lut.shape == (256, 3)
    assert lut.min() >= 0.0 and lut.max() <= 1.0


def test_apply_lut():
    lut = builtin_lut("gray")
    img = np.array([[0.0, 1.0]], np.float32)
    out = apply_lut(img, lut)
    np.testing.assert_allclose(out[0, 0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], [1, 1, 1], atol=1e-6)


def test_bscan_enface_export(tmp_path, volume):
    p1 = save_bscan_png(str(tmp_path / "b.png"), volume, frame_nr=2)
    p2 = save_enface_png(str(tmp_path / "e.png"), volume, depth_nr=12,
                         lut=builtin_lut("fire"))
    from PIL import Image
    assert Image.open(p1).size == (16, 32)   # (ascans, depth)
    img2 = Image.open(p2)
    assert img2.size == (16, 16) and img2.mode == "RGB"


@pytest.mark.parametrize("mode", list(RenderMode))
def test_render_modes_produce_signal(volume, mode):
    params = RenderParams(mode=mode, step_length=0.05, threshold=0.2,
                          shading=(mode == RenderMode.ISOSURFACE))
    img = render_volume(volume, params, out_shape=(32, 32))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert img.max() > 0.05, f"{mode} produced an all-black image"


def test_mip_sees_brightest(volume):
    img = render_volume(volume, RenderParams(mode=RenderMode.MIP,
                                             step_length=0.02, threshold=0.1,
                                             gamma=1.0, alpha_exponent=0.0),
                        out_shape=(32, 32))
    # brightest structure is 0.8; alpha_exponent=0 -> a=1, so the shader's
    # background blend leaves the max intensity itself
    assert abs(img[16, 16].max() - 0.8) < 0.1


def test_render_rotated(volume):
    img = render_volume(volume, RenderParams(mode=RenderMode.MIP,
                                             step_length=0.05, threshold=0.1),
                        yaw=0.7, pitch=0.4, out_shape=(24, 24))
    assert np.isfinite(img).all() and img.max() > 0.05


def test_render_with_lut(volume):
    lut = builtin_lut("fire")
    img = render_volume(volume, RenderParams(mode=RenderMode.MIP,
                                             step_length=0.05, threshold=0.1),
                        out_shape=(24, 24), lut=lut)
    # fire LUT is colored: channels differ somewhere
    assert not np.allclose(img[..., 0], img[..., 2], atol=1e-3)


def test_compute_sample_depths(volume):
    d = np.asarray(compute_sample_depths(volume, threshold=0.1))
    assert d.shape == volume.shape
    col = d[0, 0]  # slab at 10..14; scan from high z down
    assert col[20] == 0.0          # above the surface (scanned first): no signal yet
    assert col[13] > 0.9           # surface voxel ~1.0
    assert col[5] < col[13]        # deeper -> smaller depth value
