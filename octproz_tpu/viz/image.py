"""Image export and LUT color mapping for processed OCT data.

Offline replacement for the reference's OpenGL display path: B-scan / en-face
frames are written as PNGs instead of textures (GLWindow2D,
octproz_project/octproz/src/glwindow2d.cpp:520-523 + screenshot saving), and
the 1-D color LUTs mirror the PNG LUTs the 3D viewer loads from
``octproz/luts/`` (glwindow3d.cpp LUT selection; files blue_lut.png,
fire_lut.png, ...).  LUT PNGs are Nx1 (or 1xN) RGB strips; ``builtin_lut``
generates equivalents procedurally so no asset files are required.
"""

from __future__ import annotations

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """float (0..1, clipped) -> uint8."""
    return (np.clip(np.asarray(img, np.float32), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, img: np.ndarray) -> str:
    """Save (H, W) grayscale or (H, W, 3) RGB float 0..1 (or uint8) image."""
    from PIL import Image
    import os

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)
    return path


def load_lut_png(path: str) -> np.ndarray:
    """Load an Nx1 / 1xN RGB LUT strip PNG -> float32 (N, 3) in 0..1."""
    from PIL import Image

    arr = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    if arr.shape[0] == 1:
        arr = arr[0]
    elif arr.shape[1] == 1:
        arr = arr[:, 0]
    else:  # take the first row of a wider image
        arr = arr[0]
    return np.ascontiguousarray(arr, np.float32)


def builtin_lut(name: str, n: int = 256) -> np.ndarray:
    """Procedural equivalents of the shipped LUTs (octproz/luts/info.txt).

    Supported: gray, fire, hotter, ice, blue, deep_blue, deep_red,
    six_shades, sixteen_colors, depth_colors.
    """
    t = np.linspace(0.0, 1.0, n, dtype=np.float32)

    def ramp(*stops):
        """Piecewise-linear RGB ramp from (pos, (r, g, b)) stops."""
        pos = np.array([s[0] for s in stops], np.float32)
        cols = np.array([s[1] for s in stops], np.float32)
        return np.stack([np.interp(t, pos, cols[:, c]) for c in range(3)], axis=1)

    if name == "gray":
        return np.stack([t, t, t], axis=1)
    if name == "fire":
        return ramp((0, (0, 0, 0)), (0.35, (0.8, 0, 0)), (0.7, (1, 0.8, 0)), (1, (1, 1, 1)))
    if name == "hotter":
        return ramp((0, (0, 0, 0)), (0.25, (1, 0, 0)), (0.6, (1, 1, 0)), (1, (1, 1, 1)))
    if name == "ice":
        return ramp((0, (0, 0, 0)), (0.4, (0, 0.3, 0.8)), (0.75, (0.3, 0.8, 1)), (1, (1, 1, 1)))
    if name == "blue":
        return ramp((0, (0, 0, 0)), (0.5, (0, 0.2, 1)), (1, (0.8, 0.95, 1)))
    if name == "deep_blue":
        return ramp((0, (0, 0, 0.1)), (0.6, (0, 0.1, 0.7)), (1, (0.6, 0.8, 1)))
    if name == "deep_red":
        return ramp((0, (0.1, 0, 0)), (0.6, (0.7, 0.05, 0)), (1, (1, 0.8, 0.6)))
    if name == "six_shades":
        levels = np.floor(t * 5.999) / 5.0
        return np.stack([levels] * 3, axis=1).astype(np.float32)
    if name == "sixteen_colors":
        import colorsys
        idx = np.floor(t * 15.999).astype(int)
        cols = np.array([colorsys.hsv_to_rgb(h / 16.0, 1.0, 1.0) for h in range(16)],
                        np.float32)
        return cols[idx]
    if name == "depth_colors":
        import colorsys
        cols = np.array([colorsys.hsv_to_rgb(0.8 * (1 - x), 0.9, 1.0) for x in t],
                        np.float32)
        return cols
    raise ValueError(f"unknown builtin LUT '{name}'")


def apply_lut(img: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Map grayscale (H, W) float 0..1 through an (N, 3) LUT -> (H, W, 3)."""
    lut = np.asarray(lut, np.float32)
    idx = np.clip(np.asarray(img, np.float32), 0.0, 1.0) * (lut.shape[0] - 1)
    return lut[(idx + 0.5).astype(np.int32)]


def save_bscan_png(path: str, volume, frame_nr: int = 0, lut=None, **kw) -> str:
    """Slice + save a B-scan frame (display orientation: depth vertical)."""
    from ..ops.projections import bscan_frame

    frame = np.asarray(bscan_frame(volume, frame_nr, **kw)).T  # (depth, ascans)
    frame = np.clip(frame, 0.0, 1.0)
    return save_png(path, apply_lut(frame, lut) if lut is not None else frame)


def save_enface_png(path: str, volume, depth_nr: int = 0, lut=None, **kw) -> str:
    from ..ops.projections import enface_frame

    frame = np.clip(np.asarray(enface_frame(volume, depth_nr, **kw)), 0.0, 1.0)
    return save_png(path, apply_lut(frame, lut) if lut is not None else frame)
