"""Post-IFFT image-domain processing: mirror-artifact truncation with log/lin
dynamic-range scaling, bidirectional B-scan flip, sinusoidal scan correction,
and post-process background removal.

Numerics match the reference kernels
(octproz_project/octproz/src/cuda_code.cu):

* ``postProcessTruncateLog`` (:699-720):
    out = coeff * ((10*log10((re^2+im^2)/half) - min)/(max-min) + addend)
  where half = samples_per_line/2 is both the truncation length and the
  folded-in FFT normalization (see the comment block cuda_code.cu:713-714).
* ``postProcessTruncateLin`` (:722-741):
    out = coeff * ((sqrt(re^2+im^2)/half - min)/(max-min) + addend)
* ``cuda_bscanFlip`` (:787-807): reverse the A-scan order of every second
  B-scan (even B-scan indices 0, 2, 4, ... -- bidirectional scanning).
* ``sinusoidalScanCorrection`` (:491-514): image-domain resample along the
  fast-scan (A-scan-within-B-scan) axis with the acos curve
  (fillSinusoidalScanCorrectionCurve, :516-521), linear interpolation between
  whole A-scans.  The reference's flat-index guard leaves the very last
  A-scan of each buffer unmodified (index < samples - width, :499); we
  reproduce that.
* ``getPostProcessBackground`` (:743-755): mean A-scan over the buffer.
* ``postProcessBackgroundRemoval`` (:757-767):
    out = saturate01(data - (weight*bg + offset)).
"""

from __future__ import annotations

import jax.numpy as jnp


def truncate_half(z: jnp.ndarray) -> jnp.ndarray:
    """Keep the positive-depth half of each A-scan: (..., n) -> (..., n//2)."""
    return z[..., : z.shape[-1] // 2]


def scale_log_planar(re: jnp.ndarray, im: jnp.ndarray, half_len: int,
                     gmin: float, gmax: float, addend: float,
                     coeff: float) -> jnp.ndarray:
    db = 10.0 * jnp.log10((re**2 + im**2) / jnp.float32(half_len))
    return (jnp.float32(coeff) * ((db - gmin) / (gmax - gmin) + addend)).astype(jnp.float32)


def scale_lin_planar(re: jnp.ndarray, im: jnp.ndarray, half_len: int,
                     gmin: float, gmax: float, addend: float,
                     coeff: float) -> jnp.ndarray:
    mag = jnp.sqrt(re**2 + im**2) / jnp.float32(half_len)
    return (jnp.float32(coeff) * ((mag - gmin) / (gmax - gmin) + addend)).astype(jnp.float32)


def scale_log(z_half: jnp.ndarray, half_len: int, gmin: float, gmax: float,
              addend: float, coeff: float) -> jnp.ndarray:
    return scale_log_planar(z_half.real, z_half.imag, half_len, gmin, gmax,
                            addend, coeff)


def scale_lin(z_half: jnp.ndarray, half_len: int, gmin: float, gmax: float,
              addend: float, coeff: float) -> jnp.ndarray:
    return scale_lin_planar(z_half.real, z_half.imag, half_len, gmin, gmax,
                            addend, coeff)


def bscan_flip(volume: jnp.ndarray) -> jnp.ndarray:
    """Reverse A-scan order of every second B-scan (even indices).

    volume: (bscans, ascans, depth).
    """
    flipped = volume[:, ::-1, :]
    even = (jnp.arange(volume.shape[0]) % 2 == 0)[:, None, None]
    return jnp.where(even, flipped, volume)


def sinusoidal_correction(volume: jnp.ndarray, curve: jnp.ndarray) -> jnp.ndarray:
    """Resample along the A-scan axis with the sinusoidal curve.

    volume: float32 (bscans, ascans, depth); curve: float32 (ascans,)
    with curve[k] = (L/pi)*acos(1 - 2k/L).
    """
    n_asc = volume.shape[1]
    x0 = curve.astype(jnp.int32)
    frac = (curve - x0.astype(jnp.float32))[None, :, None]
    f0 = jnp.take(volume, jnp.clip(x0, 0, n_asc - 1), axis=1)
    f1 = jnp.take(volume, jnp.clip(x0 + 1, 0, n_asc - 1), axis=1)
    out = f0 + (f1 - f0) * frac
    # Reference guard `index < samples - width` (cuda_code.cu:499) leaves the
    # final A-scan of the buffer untouched.  Expressed as an elementwise
    # index-mask select, NOT `.at[-1, -1].set(...)`: the global-index update
    # makes GSPMD ship a whole B-scan between shards (a collective-permute
    # plus an all-reduce on B-scan-sharded meshes, measured in
    # tests/test_traffic.py), while the mask select partitions to pure
    # local compute.
    n_b = volume.shape[0]
    last = ((jnp.arange(n_b) == n_b - 1)[:, None, None]
            & (jnp.arange(n_asc) == n_asc - 1)[None, :, None])
    return jnp.where(last, volume, out)


def get_background(volume: jnp.ndarray) -> jnp.ndarray:
    """Mean A-scan over the whole buffer: (bscans, ascans, depth) -> (depth,)."""
    return jnp.mean(volume, axis=(0, 1))


def remove_post_background(volume: jnp.ndarray, background: jnp.ndarray,
                           weight: float, offset: float) -> jnp.ndarray:
    out = volume - (jnp.float32(weight) * background + jnp.float32(offset))
    return jnp.clip(out, 0.0, 1.0)
