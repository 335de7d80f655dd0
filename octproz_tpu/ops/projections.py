"""Display-frame extraction: B-scan slices, en-face slices, and volume
projections with frame averaging / maximum-intensity projection.

Capability-equivalent of the reference's display-buffer kernels
(octproz_project/octproz/src/cuda_code.cu):

* ``updateDisplayedBscanFrame``     (:810-860): B-scan frame = volume[b, :, :]
  with optional averaging or MIP over ``display_frames`` adjacent B-scans
  (frames past the end of the volume are skipped, not clamped).
* ``updateDisplayedEnFaceViewFrame`` (:862-912): en-face frame =
  volume[:, :, d] with averaging/MIP over adjacent depth indices.
* full-volume MIP / mean projections along any axis (the offline analog of
  the reference's GLSL raycast modes, glwindow3d.cpp:266-272).

The reference also reverses sample order for OpenGL display orientation
(cuda_code.cu:828,884); that is a presentation concern and is exposed via
``flip_display`` rather than baked in.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..params import DisplayFunction


def _frame_window(volume_frames: int, frame_nr: int, display_frames: int):
    """Static list of frame indices composited together (skip out-of-range,
    mirroring the `frameForAveraging < total` guard, cuda_code.cu:827).

    frame_nr is clamped to [0, volume_frames) first: the reference kernel's
    frameNr is unsigned (cuda_code.cu:815), so a scrubbing UI decrementing
    past 0 must not wrap to the volume's tail via Python negative indexing.
    """
    frame_nr = min(max(frame_nr, 0), volume_frames - 1)
    idx = [frame_nr + j for j in range(max(display_frames, 1))]
    idx = [i for i in idx if i < volume_frames]
    return np.asarray(idx if idx else [frame_nr], dtype=np.int32)


def bscan_frame(volume: jnp.ndarray, frame_nr: int, display_frames: int = 1,
                function: DisplayFunction = DisplayFunction.AVERAGING,
                flip_display: bool = False) -> jnp.ndarray:
    """volume (bscans, ascans, depth) -> (ascans, depth) display frame."""
    idx = _frame_window(volume.shape[0], frame_nr, display_frames)
    frames = volume[idx, :, :]
    if function == DisplayFunction.MIP and len(idx) > 1:
        # reference maxValue starts at 0 (cuda_code.cu:841-852): all-
        # negative columns display 0, not the true (negative) maximum
        out = jnp.maximum(jnp.max(frames, axis=0), 0.0)
    else:
        out = jnp.mean(frames, axis=0)
    if flip_display:
        out = out[::-1, ::-1]
    return out


def enface_frame(volume: jnp.ndarray, depth_nr: int, display_frames: int = 1,
                 function: DisplayFunction = DisplayFunction.AVERAGING,
                 flip_display: bool = False) -> jnp.ndarray:
    """volume (bscans, ascans, depth) -> (bscans, ascans) en-face frame."""
    idx = _frame_window(volume.shape[2], depth_nr, display_frames)
    frames = volume[:, :, idx]
    if function == DisplayFunction.MIP and len(idx) > 1:
        out = jnp.maximum(jnp.max(frames, axis=2), 0.0)
    else:
        out = jnp.mean(frames, axis=2)
    if flip_display:
        out = out[::-1, ::-1]
    return out


def mip_projection(volume: jnp.ndarray, axis: int = 2) -> jnp.ndarray:
    """Maximum-intensity projection along an axis (offline 3D-view analog)."""
    return jnp.max(volume, axis=axis)


def mean_projection(volume: jnp.ndarray, axis: int = 2) -> jnp.ndarray:
    return jnp.mean(volume, axis=axis)
