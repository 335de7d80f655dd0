"""Fused spectrum preparation: decode x background x resample x window x
dispersion phase in a single VMEM pass.

This is the TPU-native answer to the reference's triple-fused CUDA kernels
``klinearization{,Cubic,Lanczos}AndWindowingAndDispersionCompensation``
(octproz_project/octproz/src/cuda_code.cu:413-489), which its paper calls out
as the key performance trick (paper/paper.md:52).  Instead of translating the
per-sample gather code, we exploit that every pre-FFT stage is a *linear*
operator on each A-scan whose coefficients depend only on the intra-line
index:

  decode        d = float(raw)            (elementwise)
  background    b = (I - M) d             M = rolling-mean band matrix
                                          (cuda_code.cu:165-211)
  k-linearize   r = R b                   R = interpolation band matrix
                                          (cuda_code.cu:213-326)
  window        w = diag(win) r           (cuda_code.cu:328-339)
  dispersion    z = w * (cos phi, sin phi)  (cuda_code.cu:609-622)

so the whole chain is ``z = (W_op @ d) * phasor`` with
``W_op = diag(win) R (I - M)`` precomputed once per curve update (host
numpy, the analog of the reference's LUT uploads cuda_code.cu:636-657).
At runtime a single Pallas kernel per block of A-scan lines does:

  uint -> f32 decode (VPU) -> one (TILE_L, n_in) x (n_in, n_out) GEMM (MXU)
  -> phasor epilogue (VPU) -> planar re/im writes

One matmul per line replaces the reference's five memory-bound passes; the
raw integers are read from HBM exactly once and nothing intermediate ever
leaves VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.background import rolling_average_indices
from ..params import AcqParams, ProcConfig


def _effective_precision(compute_dtype: str, precision: str) -> str:
    """matmul_precision is IGNORED with compute_dtype="bfloat16"
    (ProcConfig contract): the operands are already bf16, the multi-pass
    split is meaningless, and native HIGH/HIGHEST must never reach a
    Mosaic dot (rejected / tunnel-wedging).  Wrappers normalize through
    this so the jit cache key and the kernels agree."""
    return "default" if compute_dtype == "bfloat16" else precision


def _precision(name: str):
    """Native XLA dot precision (see ProcConfig.matmul_precision): the MXU
    multiplies in bfloat16, so "default" float32 is bf16-grade.

    "high" and "highest" never reach this table on the fold paths: Mosaic
    rejects lax.Precision.HIGH ("Unsupported dot precision") and the native
    6-pass HIGHEST wedges the axon remote-compile tunnel, so both are
    implemented manually via :func:`_split_bf16` + :func:`_dot_split`
    (bf16 operand decomposition, 3 / 5 MXU passes)."""
    return {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[name]


#: Operator split widths for the manual multi-pass GEMM emulation:
#: "high" -> 2 bf16 parts (3 MXU passes), "highest" -> 3 parts (5 passes).
_SPLIT_PARTS = {"high": 2, "highest": 3}


def _bf16_trunc(v):
    """The exactly-bf16-representable truncation of float32 v, computed by
    MASKING the low 16 mantissa bits (bitcast + AND).

    NOT written as ``v.astype(bf16).astype(f32)``: compilers may fold the
    lossy cast round-trip back to ``v`` (measured on the TPU backend: the
    cast-based residual collapsed to ~0 and the 3-pass split degenerated to
    single-pass accuracy, 1.8e-3 vs the expected 4e-6).  An integer mask
    cannot be elided.  Truncation (vs round-to-nearest) costs <1 bit in the
    split's error bound."""
    i = jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.int32)
    return jax.lax.bitcast_convert_type(
        jax.lax.bitwise_and(i, jnp.int32(-65536)), jnp.float32)


def _split_bf16(w, parts: int = 2):
    """Decompose a float32 matrix into ``parts`` bf16 terms whose sum equals
    w to ~8*parts mantissa bits (hi keeps the top 8 bits, each further part
    the next 8).  Each term is exactly representable in bf16 (mask-based
    truncation), so the f32->bf16 conversions below are value-preserving
    and immune to cast folding."""
    out = []
    rem = w
    for k in range(parts):
        p = _bf16_trunc(rem) if k < parts - 1 else rem
        out.append(p.astype(jnp.bfloat16))
        rem = rem - p
    return tuple(out)


def _dot_split(x, w_parts):
    """float32-grade GEMM from bf16 MXU passes (the manual form of
    lax.Precision.HIGH / HIGHEST, which Mosaic does not legalize / which
    wedges the axon tunnel, CLAUDE.md):

        x @ w ~= sum_j x_hi @ w_j  +  sum_{j<last} x_lo @ w_j

    with f32 accumulation, smallest terms first.  x is split into two bf16
    terms; for the OCT decode path x is integer-valued (<= 16-bit), so
    x == x_hi + x_lo exactly and the only operand error is w's last-part
    rounding plus the dropped lowest-order cross terms:

      parts=2 ("high"):    3 passes, ~2^-16 relative  (vs 2^-8 for default)
      parts=3 ("highest"): 5 passes, ~2^-24 relative  (true-f32 grade)
    """
    x_hi_f = _bf16_trunc(x)  # mask-based: immune to cast folding
    x_hi = x_hi_f.astype(jnp.bfloat16)
    x_lo = (x - x_hi_f).astype(jnp.bfloat16)
    terms = [(x_hi, w) for w in w_parts] + [(x_lo, w) for w in w_parts[:-1]]
    acc = None
    for xa, wa in reversed(terms):  # low-order products first
        t = jnp.dot(xa, wa, preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    return acc


def build_prep_operator(
    acq: AcqParams,
    cfg: ProcConfig,
    resample_matrix: Optional[np.ndarray],
    window: Optional[np.ndarray],
) -> np.ndarray:
    """Fold background removal, k-linearization and windowing into one
    (n_in, n_out) operator applied as ``lines @ op``.

    Composition order matches the pipeline stage order (cuda_code.cu:
    1422-1511): background first, then resampling, then window scaling.
    """
    n = acq.samples_per_line
    op = np.eye(n, dtype=np.float64)
    if cfg.background_removal:
        start, end, count = rolling_average_indices(n, cfg.rolling_average_window)
        m = np.zeros((n, n), dtype=np.float64)
        for i in range(n):
            m[i, start[i]:end[i] + 1] = 1.0 / count[i]
        op = op - m  # (I - M)
    if cfg.resampling:
        if resample_matrix is None:
            raise ValueError("resampling enabled but no resample matrix given")
        op = np.asarray(resample_matrix, np.float64) @ op
    if cfg.windowing:
        if window is None:
            raise ValueError("windowing enabled but no window curve given")
        op = np.asarray(window, np.float64)[:, None] * op
    return np.ascontiguousarray(op.T, dtype=np.float32)  # (n_in, n_out)


def build_depth_operator(
    acq: AcqParams,
    cfg: ProcConfig,
    resample_matrix: Optional[np.ndarray],
    window: Optional[np.ndarray],
    phase: Optional[np.ndarray],
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold the ENTIRE pre-FPN chain -- background, k-linearization, window,
    dispersion phasor, unnormalized inverse DFT, mirror truncation -- into one
    complex (n_in, half) operator applied as ``lines @ (re + i im)``.

    The inverse FFT is linear too, so with F[k, j] = exp(+2i pi k j / n)
    (the unnormalized inverse-DFT rows for the kept half, matching
    cufftExecC2C(CUFFT_INVERSE), cuda_code.cu:1513-1515):

        z_half = F_half . diag(phasor) . diag(win) . R . (I - M) . decode(raw)

    A dense (1024 x 512) complex GEMM costs ~40x the FLOPs of an FFT but
    runs on the MXU at full tilt, replaces five memory-bound passes with one,
    and keeps every intermediate in VMEM -- on TPU this is the
    speed-of-light formulation for OCT line lengths (and sidesteps FFT
    support gaps in experimental backends).
    """
    n = acq.samples_per_line
    half = acq.output_ascan_length
    op = build_prep_operator(acq, cfg, resample_matrix, window)  # (n_in, n_out)
    opd = op.astype(np.float64).T  # (n_out, n_in)
    if cfg.dispersion:
        if phase is None:
            raise ValueError("dispersion enabled but no phasor given")
        opd = np.asarray(phase, np.complex128)[:, None] * opd
    j = np.arange(n, dtype=np.float64)
    k = np.arange(half, dtype=np.float64)
    f_half = np.exp(2j * np.pi * np.outer(k, j) / n)  # (half, n_out)
    total = f_half @ opd                               # (half, n_in) complex
    total_t = np.ascontiguousarray(total.T)            # (n_in, half)
    return (total_t.real.astype(np.float32), total_t.imag.astype(np.float32))


def _decode_block(x, bit_depth: int, bitshift: bool):
    """In-kernel integer decode (ops.convert.decode numerics,
    cuda_code.cu:109-147).

    Mosaic has no direct uint8/uint16 -> float32 cast; route through int32
    (lossless for <= 16-bit samples).  >16-bit input is decoded outside the
    kernel (see _predecode)."""
    if x.dtype == jnp.float32:
        return x  # already decoded outside the kernel
    xi = x.astype(jnp.int32)
    if bitshift:
        # shift after the int32 cast: Mosaic cannot legalize shifts on
        # sub-word unsigned types (arith.shrui on uint16)
        xi = jax.lax.shift_right_arithmetic(xi, jnp.asarray(4, jnp.int32))
    return xi.astype(jnp.float32)


def _predecode(raw2d, bit_depth: int, bitshift: bool):
    """Decode outside the kernel when the in-kernel path can't (>16-bit
    containers, whose uint32 -> int32 cast would wrap)."""
    if bit_depth > 16:
        from ..ops.convert import decode
        return decode(raw2d, bit_depth, bitshift)
    return raw2d


def _kernel_phase(raw_ref, op_ref, cos_ref, sin_ref, re_ref, im_ref,
                  *, bit_depth: int, bitshift: bool, compute_dtype,
                  precision):
    x = _decode_block(raw_ref[:], bit_depth, bitshift).astype(compute_dtype)
    y = jnp.dot(x, op_ref[:], preferred_element_type=jnp.float32,
                precision=precision)
    re_ref[:] = y * cos_ref[:]
    im_ref[:] = y * sin_ref[:]


def _kernel_real(raw_ref, op_ref, out_ref, *, bit_depth: int, bitshift: bool,
                 compute_dtype, precision):
    x = _decode_block(raw_ref[:], bit_depth, bitshift).astype(compute_dtype)
    out_ref[:] = jnp.dot(x, op_ref[:], preferred_element_type=jnp.float32,
                         precision=precision)


def _kernel_phase_split(raw_ref, *refs, bit_depth: int, bitshift: bool,
                        parts: int):
    ops, (cos_ref, sin_ref, re_ref, im_ref) = refs[:parts], refs[parts:]
    x = _decode_block(raw_ref[:], bit_depth, bitshift)
    y = _dot_split(x, [o[:] for o in ops])
    re_ref[:] = y * cos_ref[:]
    im_ref[:] = y * sin_ref[:]


def _kernel_real_split(raw_ref, *refs, bit_depth: int, bitshift: bool,
                       parts: int):
    ops, (out_ref,) = refs[:parts], refs[parts:]
    x = _decode_block(raw_ref[:], bit_depth, bitshift)
    out_ref[:] = _dot_split(x, [o[:] for o in ops])


def _kernel_depth(raw_ref, wre_ref, wim_ref, re_ref, im_ref,
                  *, bit_depth: int, bitshift: bool, compute_dtype, precision):
    """Decode + full-fold depth operator: two GEMMs, nothing else."""
    x = _decode_block(raw_ref[:], bit_depth, bitshift).astype(compute_dtype)
    re_ref[:] = jnp.dot(x, wre_ref[:], preferred_element_type=jnp.float32,
                        precision=precision)
    im_ref[:] = jnp.dot(x, wim_ref[:], preferred_element_type=jnp.float32,
                        precision=precision)


def _kernel_depth_split(raw_ref, *refs, bit_depth: int, bitshift: bool,
                        parts: int):
    """Multi-pass ("high"/"highest") variant of _kernel_depth: f32-grade
    fidelity from bf16 operand splits (see _dot_split)."""
    wre = refs[:parts]
    wim = refs[parts:2 * parts]
    re_ref, im_ref = refs[2 * parts:]
    x = _decode_block(raw_ref[:], bit_depth, bitshift)
    re_ref[:] = _dot_split(x, [o[:] for o in wre])
    im_ref[:] = _dot_split(x, [o[:] for o in wim])


def _scale_affine(log_scaling: bool, half: int, gmin: float, gmax: float,
                  addend: float, coeff: float) -> Tuple[float, float]:
    """Fold the dynamic-range scaling into two constants so the kernel
    epilogue is one transcendental plus one fma per element:

      log: coeff*((10*log10(p/half) - gmin)/(gmax-gmin) + addend) = A*log10(p) + B
      lin: coeff*((sqrt(p)/half   - gmin)/(gmax-gmin) + addend) = A*sqrt(p)  + B

    Computed in float64 numpy (division by a zero range yields inf, matching
    the unfolded expression's behavior, not a Python exception)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.float64(coeff) / (np.float64(gmax) - np.float64(gmin))
        base = np.float64(coeff) * addend - s * gmin
        if log_scaling:
            a = 10.0 * s
            b = base - s * 10.0 * np.log10(np.float64(half))
        else:
            a = s / np.float64(half)
            b = base
    return float(a), float(b)


_LOG2_POLY = (-2.786805564, 5.046852936, -3.492466043, 1.593884548,
              -4.048623094e-01, 4.342836333e-02)  # log2(m), m in [1,2),
# degree-5 least-squares fit, max |err| 3.2e-5 (~115 dB-grade on a 60 dB
# display range) -- the TPU analog of the reference's --use_fast_math
# log10f (octproz/pri/cuda.pri:66-71)


def _fast_log2(p):
    """Exponent-extraction log2: integer ops + 5 fma, no transcendental.
    p must be a non-negative float32 (sum of squares here).  p == 0 yields
    ~-127 (finite) instead of -inf."""
    i = jax.lax.bitcast_convert_type(p, jnp.int32)
    e = jax.lax.shift_right_logical(i, jnp.int32(23)) - jnp.int32(127)
    mi = jax.lax.bitwise_or(jax.lax.bitwise_and(i, jnp.int32(0x007FFFFF)),
                            jnp.int32(0x3F800000))
    m = jax.lax.bitcast_convert_type(mi, jnp.float32)
    r = jnp.float32(_LOG2_POLY[-1])
    for c in _LOG2_POLY[-2::-1]:
        r = r * m + jnp.float32(c)
    return e.astype(jnp.float32) + r


def _scale_epilogue(p, *, log_scaling: bool, a: float, b: float,
                    fast_log: bool = False):
    if log_scaling and fast_log:
        # a*log10(p) + b == (a*log10(2))*log2(p) + b
        return jnp.float32(a * 0.30102999566398120) * _fast_log2(p) \
            + jnp.float32(b)
    v = jnp.log10(p) if log_scaling else jnp.sqrt(p)
    return jnp.float32(a) * v + jnp.float32(b)


def _kernel_depth_scale_concat(raw_ref, w_ref, mean_ref, out_ref,
                               *, bit_depth: int, bitshift: bool,
                               compute_dtype, precision, log_scaling: bool,
                               half: int, a: float, b: float):
    """Single-GEMM variant: the (re | im) operators are concatenated along
    the output axis so the MXU runs ONE (tile, n_in) x (n_in, 2*half) pass
    per tile instead of two half-width ones."""
    x = _decode_block(raw_ref[:], bit_depth, bitshift).astype(compute_dtype)
    y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32,
                precision=precision)
    re = y[:, :half] - mean_ref[0:1, :]
    im = y[:, half:] - mean_ref[1:2, :]
    p = re * re + im * im
    out = _scale_epilogue(p, log_scaling=log_scaling, a=a, b=b)
    out_ref[:] = out.astype(out_ref.dtype)


def _kernel_depth_scale_concat_split(raw_ref, *refs, bit_depth: int,
                                     bitshift: bool, log_scaling: bool,
                                     half: int, a: float, b: float,
                                     parts: int):
    """fold_concat x multi-pass split: the (re | im) operators are
    concatenated along the output axis BEFORE the bf16 decomposition, so
    each of the 2*parts-1 MXU passes is ONE full-width
    (tile, n_in) x (n_in, 2*half) GEMM -- for "high" that is 3 wide passes
    per tile instead of 6 half-width ones (fewer dispatches, better MXU
    tiling at the 1024-wide output)."""
    wides = refs[:parts]
    mean_ref, out_ref = refs[parts:]
    x = _decode_block(raw_ref[:], bit_depth, bitshift)
    y = _dot_split(x, [w[:] for w in wides])
    re = y[:, :half] - mean_ref[0:1, :]
    im = y[:, half:] - mean_ref[1:2, :]
    p = re * re + im * im
    out = _scale_epilogue(p, log_scaling=log_scaling, a=a, b=b)
    out_ref[:] = out.astype(out_ref.dtype)


def _kernel_depth_scale(raw_ref, wre_ref, wim_ref, mean_ref, out_ref,
                        *, bit_depth: int, bitshift: bool, compute_dtype,
                        precision, log_scaling: bool, a: float, b: float,
                        fast_log: bool = False, k_split: int = 1):
    """Decode + full-fold depth operator + FPN mean-line subtraction +
    dynamic-range scaling, all in one VMEM pass.

    The planar (re, im) depth profiles never reach HBM: the epilogue
    (meanALineSubtraction + postProcessTruncateLog/Lin numerics,
    cuda_code.cu:567-584,699-741 -- constant-folded to A*log10(p)+B, see
    _scale_affine) runs on the GEMM tile while it is still in VMEM and only
    the final magnitude image is written -- per buffer that removes a
    write+read of both full planar volumes.

    k_split > 1 splits the contraction dim into independent
    decode->partial-GEMM chains so Mosaic can overlap the VPU integer
    decode of chunk j+1 with the MXU pass of chunk j (the decode is
    otherwise a serial prologue of every grid step)."""
    if k_split > 1:
        n_in = raw_ref.shape[-1]
        kk = n_in // k_split
        re = im = jnp.float32(0)
        for j in range(k_split):
            sl = slice(j * kk, (j + 1) * kk) if j < k_split - 1 else \
                slice(j * kk, n_in)
            xj = _decode_block(raw_ref[:, sl], bit_depth,
                               bitshift).astype(compute_dtype)
            re = re + jnp.dot(xj, wre_ref[sl, :],
                              preferred_element_type=jnp.float32,
                              precision=precision)
            im = im + jnp.dot(xj, wim_ref[sl, :],
                              preferred_element_type=jnp.float32,
                              precision=precision)
    else:
        x = _decode_block(raw_ref[:], bit_depth, bitshift).astype(compute_dtype)
        re = jnp.dot(x, wre_ref[:], preferred_element_type=jnp.float32,
                     precision=precision)
        im = jnp.dot(x, wim_ref[:], preferred_element_type=jnp.float32,
                     precision=precision)
    re = re - mean_ref[0:1, :]
    im = im - mean_ref[1:2, :]
    p = re * re + im * im
    out = _scale_epilogue(p, log_scaling=log_scaling, a=a, b=b,
                          fast_log=fast_log)
    out_ref[:] = out.astype(out_ref.dtype)


def _kernel_depth_scale_split(raw_ref, *refs, bit_depth: int, bitshift: bool,
                              log_scaling: bool, a: float, b: float,
                              parts: int):
    """Multi-pass ("high"/"highest") variant of _kernel_depth_scale: the
    same single-pass epilogue, but the two depth GEMMs run as bf16 operand
    splits (_dot_split) for float32-grade fidelity at 3x/5x the default-pass
    cost -- the Mosaic-safe fidelity ladder (native HIGH is rejected by
    Mosaic; native 6-pass HIGHEST wedges the axon tunnel, CLAUDE.md)."""
    wre = refs[:parts]
    wim = refs[parts:2 * parts]
    mean_ref, out_ref = refs[2 * parts:]
    x = _decode_block(raw_ref[:], bit_depth, bitshift)
    re = _dot_split(x, [o[:] for o in wre]) - mean_ref[0:1, :]
    im = _dot_split(x, [o[:] for o in wim]) - mean_ref[1:2, :]
    p = re * re + im * im
    out = _scale_epilogue(p, log_scaling=log_scaling, a=a, b=b)
    out_ref[:] = out.astype(out_ref.dtype)


def _pick_tile(n_lines: int, n_in: int = 1024, max_tile: int = 0) -> int:
    """Lines per kernel tile.  512 at 1024-sample lines measured fastest on
    v5e (56.7 vs 56.3 MHz at 256; docs/performance.md) and keeps the tile
    operands within the ~16 MB VMEM with double buffering; the cap scales
    down with longer lines so the raw+decoded tile footprint stays constant.
    ``max_tile`` (ProcConfig.pallas_tile) overrides the cap; 0 = auto."""
    if max_tile <= 0:
        max_tile = max(64, 512 * 1024 // max(n_in, 1))
    for tile in (1024, 512, 256, 128, 64, 32, 16, 8):
        if tile <= max_tile and n_lines % tile == 0:
            return tile
    # No power-of-two candidate divides n_lines (odd/prime line counts):
    # take the largest divisor within the cap rather than silently running
    # one whole-buffer tile (which can blow VMEM and ignores the cap).
    for tile in range(min(max_tile, n_lines), 0, -1):
        if n_lines % tile == 0:
            return tile
    return n_lines


@functools.partial(jax.jit, static_argnames=("bit_depth", "bitshift",
                                              "compute_dtype", "precision",
                                              "max_tile", "interpret"))
def _fused_prep_impl(raw2d, op, cos_row, sin_row, *, bit_depth: int,
                     bitshift: bool, precision: str, interpret: bool,
                     compute_dtype: str = "float32", max_tile: int = 0):
    n_lines, n_in = raw2d.shape
    n_out = op.shape[1]
    tile = _pick_tile(n_lines, n_in, max_tile)
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    if compute_dtype == "bfloat16":
        op = op.astype(jnp.bfloat16)  # same bf16 operand rule as the
        # depth paths (the GEMM, not the f32 phasor epilogue, is the cost)
    grid = (n_lines // tile,)
    line_spec = pl.BlockSpec((tile, n_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    op_spec = pl.BlockSpec((n_in, n_out), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, n_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * n_lines * n_in * n_out,
        bytes_accessed=raw2d.size * raw2d.dtype.itemsize
        + op.size * 4 + 2 * n_lines * n_out * 4,
        transcendentals=0,
    )
    # matmul_precision is ignored with compute_dtype="bfloat16" (same gate as
    # the depth paths): bf16 operands make the multi-pass split meaningless.
    parts = (_SPLIT_PARTS.get(precision)
             if compute_dtype != "bfloat16" else None)
    if parts:
        op_parts = _split_bf16(op, parts)
        cost_split = pl.CostEstimate(
            flops=(2 * parts - 1) * 2 * n_lines * n_in * n_out,
            bytes_accessed=raw2d.size * raw2d.dtype.itemsize
            + parts * op.size * 2 + 2 * n_lines * n_out * 4,
            transcendentals=0)
        if cos_row is not None:
            row_spec = pl.BlockSpec((1, n_out), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
            kernel = functools.partial(_kernel_phase_split,
                                       bit_depth=bit_depth,
                                       bitshift=bitshift, parts=parts)
            re, im = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[line_spec] + [op_spec] * parts
                + [row_spec, row_spec],
                out_specs=(out_spec, out_spec),
                out_shape=(
                    jax.ShapeDtypeStruct((n_lines, n_out), jnp.float32),
                    jax.ShapeDtypeStruct((n_lines, n_out), jnp.float32),
                ),
                cost_estimate=cost_split,
                interpret=interpret,
            )(raw2d, *op_parts, cos_row, sin_row)
            return jax.lax.complex(re, im)
        kernel = functools.partial(_kernel_real_split, bit_depth=bit_depth,
                                   bitshift=bitshift, parts=parts)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[line_spec] + [op_spec] * parts,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n_lines, n_out), jnp.float32),
            cost_estimate=cost_split,
            interpret=interpret,
        )(raw2d, *op_parts)
    if cos_row is not None:
        row_spec = pl.BlockSpec((1, n_out), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        kernel = functools.partial(_kernel_phase, bit_depth=bit_depth,
                                   bitshift=bitshift, compute_dtype=cdt,
                                   precision=_precision(precision))
        re, im = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[line_spec, op_spec, row_spec, row_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(
                jax.ShapeDtypeStruct((n_lines, n_out), jnp.float32),
                jax.ShapeDtypeStruct((n_lines, n_out), jnp.float32),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(raw2d, op, cos_row, sin_row)
        return jax.lax.complex(re, im)
    kernel = functools.partial(_kernel_real, bit_depth=bit_depth,
                               bitshift=bitshift, compute_dtype=cdt,
                               precision=_precision(precision))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[line_spec, op_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_lines, n_out), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(raw2d, op)


@functools.partial(jax.jit, static_argnames=("bit_depth", "bitshift",
                                              "compute_dtype", "precision",
                                              "max_tile", "interpret"))
def _fused_depth_impl(raw2d, w_re, w_im, *, bit_depth: int, bitshift: bool,
                      compute_dtype: str, precision: str, interpret: bool,
                      max_tile: int = 0):
    n_lines, n_in = raw2d.shape
    half = w_re.shape[1]
    tile = _pick_tile(n_lines, n_in, max_tile)
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    if compute_dtype == "bfloat16":
        w_re, w_im = w_re.astype(jnp.bfloat16), w_im.astype(jnp.bfloat16)
    grid = (n_lines // tile,)
    line_spec = pl.BlockSpec((tile, n_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    op_spec = pl.BlockSpec((n_in, half), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, half), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    parts = _SPLIT_PARTS.get(precision) if compute_dtype != "bfloat16" else None
    if parts:
        wre = _split_bf16(w_re, parts)
        wim = _split_bf16(w_im, parts)
        kernel = functools.partial(_kernel_depth_split, bit_depth=bit_depth,
                                   bitshift=bitshift, parts=parts)
        re, im = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[line_spec] + [op_spec] * (2 * parts),
            out_specs=(out_spec, out_spec),
            out_shape=(
                jax.ShapeDtypeStruct((n_lines, half), jnp.float32),
                jax.ShapeDtypeStruct((n_lines, half), jnp.float32),
            ),
            cost_estimate=pl.CostEstimate(
                flops=(2 * parts - 1) * 4 * n_lines * n_in * half,
                bytes_accessed=raw2d.size * raw2d.dtype.itemsize
                + 2 * parts * n_in * half * 2 + 2 * n_lines * half * 4,
                transcendentals=0),
            interpret=interpret,
        )(raw2d, *wre, *wim)
        return re, im
    kernel = functools.partial(_kernel_depth, bit_depth=bit_depth,
                               bitshift=bitshift, compute_dtype=cdt,
                               precision=_precision(precision))
    re, im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[line_spec, op_spec, op_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_lines, half), jnp.float32),
            jax.ShapeDtypeStruct((n_lines, half), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_lines * n_in * half,
            bytes_accessed=raw2d.size * raw2d.dtype.itemsize
            + 2 * w_re.size * w_re.dtype.itemsize + 2 * n_lines * half * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(raw2d, w_re, w_im)
    return re, im


@functools.partial(jax.jit, static_argnames=(
    "bit_depth", "bitshift", "compute_dtype", "precision", "log_scaling",
    "gmin", "gmax", "addend", "coeff", "output_dtype", "interpret",
    "fold_concat", "fast_log", "k_split", "max_tile"))
def _fused_depth_scale_impl(raw2d, w_re, w_im, mean2, *, bit_depth: int,
                            bitshift: bool, compute_dtype: str,
                            precision: str, log_scaling: bool, gmin: float,
                            gmax: float, addend: float, coeff: float,
                            output_dtype: str, interpret: bool,
                            fold_concat: bool = False, fast_log: bool = False,
                            k_split: int = 1, max_tile: int = 0):
    n_lines, n_in = raw2d.shape
    half = w_re.shape[1]
    tile = _pick_tile(n_lines, n_in, max_tile)
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    odt = jnp.bfloat16 if output_dtype == "bfloat16" else jnp.float32
    if compute_dtype == "bfloat16":
        w_re, w_im = w_re.astype(jnp.bfloat16), w_im.astype(jnp.bfloat16)
    grid = (n_lines // tile,)
    line_spec = pl.BlockSpec((tile, n_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    op_spec = pl.BlockSpec((n_in, half), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    mean_spec = pl.BlockSpec((2, half), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, half), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=4 * n_lines * n_in * half,
        bytes_accessed=raw2d.size * raw2d.dtype.itemsize
        + 2 * w_re.size * w_re.dtype.itemsize
        + n_lines * half * jnp.dtype(odt).itemsize,
        transcendentals=n_lines * half if log_scaling else 0,
    )
    a, b = _scale_affine(log_scaling, half, gmin, gmax, addend, coeff)
    parts = _SPLIT_PARTS.get(precision) if compute_dtype != "bfloat16" else None
    if parts and fold_concat:
        # split + single-wide-GEMM: decompose the concatenated (n_in,
        # 2*half) operator so each bf16 pass is one full-width MXU GEMM
        wides = _split_bf16(jnp.concatenate([w_re, w_im], axis=1), parts)
        kernel = functools.partial(
            _kernel_depth_scale_concat_split, bit_depth=bit_depth,
            bitshift=bitshift, log_scaling=log_scaling, half=half, a=a, b=b,
            parts=parts)
        wide_spec = pl.BlockSpec((n_in, 2 * half), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[line_spec] + [wide_spec] * parts + [mean_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n_lines, half), odt),
            cost_estimate=pl.CostEstimate(
                flops=(2 * parts - 1) * 4 * n_lines * n_in * half,
                bytes_accessed=raw2d.size * raw2d.dtype.itemsize
                + 2 * parts * n_in * half * 2
                + n_lines * half * jnp.dtype(odt).itemsize,
                transcendentals=n_lines * half if log_scaling else 0),
            interpret=interpret,
        )(raw2d, *wides, mean2)
    if parts:
        # f32-grade fidelity from 2*parts-1 bf16 passes per GEMM (see
        # _dot_split); Mosaic cannot legalize lax.Precision.HIGH and the
        # native 6-pass HIGHEST wedges the tunnel, so the split is by hand
        wre = _split_bf16(w_re, parts)
        wim = _split_bf16(w_im, parts)
        kernel = functools.partial(
            _kernel_depth_scale_split, bit_depth=bit_depth,
            bitshift=bitshift, log_scaling=log_scaling, a=a, b=b,
            parts=parts)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[line_spec] + [op_spec] * (2 * parts) + [mean_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n_lines, half), odt),
            cost_estimate=pl.CostEstimate(
                flops=(2 * parts - 1) * 4 * n_lines * n_in * half,
                bytes_accessed=raw2d.size * raw2d.dtype.itemsize
                + 2 * parts * n_in * half * 2
                + n_lines * half * jnp.dtype(odt).itemsize,
                transcendentals=n_lines * half if log_scaling else 0),
            interpret=interpret,
        )(raw2d, *wre, *wim, mean2)
    if fold_concat:
        # single-GEMM variant: one (n_in, 2*half) operator pass per tile
        w = jnp.concatenate([w_re, w_im], axis=1)
        kernel = functools.partial(
            _kernel_depth_scale_concat, bit_depth=bit_depth,
            bitshift=bitshift, compute_dtype=cdt,
            precision=_precision(precision), log_scaling=log_scaling,
            half=half, a=a, b=b)
        wide_spec = pl.BlockSpec((n_in, 2 * half), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[line_spec, wide_spec, mean_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n_lines, half), odt),
            cost_estimate=cost,
            interpret=interpret,
        )(raw2d, w, mean2)

    kernel = functools.partial(
        _kernel_depth_scale, bit_depth=bit_depth, bitshift=bitshift,
        compute_dtype=cdt, precision=_precision(precision),
        log_scaling=log_scaling, a=a, b=b,
        fast_log=fast_log, k_split=k_split)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[line_spec, op_spec, op_spec, mean_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_lines, half), odt),
        cost_estimate=cost,
        interpret=interpret,
    )(raw2d, w_re, w_im, mean2)


def fused_depth_scale(
    raw: jnp.ndarray,
    depth_op_re: jnp.ndarray,
    depth_op_im: jnp.ndarray,
    mean2: jnp.ndarray,
    acq: AcqParams,
    cfg: ProcConfig,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Raw uint lines -> scaled magnitude image in ONE Pallas pass:
    stages 1-4 + IFFT + truncation + FPN mean subtraction + log/lin dynamic
    range.  ``mean2`` is float32 (2, half): rows are the (re, im) FPN mean
    line (pass zeros when FPN is off).  This is the steady-state hot kernel:
    only raw integers are read from HBM and only the final magnitude is
    written back."""
    if depth_op_re is None or depth_op_im is None:
        raise ValueError(
            "cfg.fft_via_matmul is set but curves.depth_op_* is None -- "
            "build the curves with the same config (make_curves(acq, cfg, ...))")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead_shape = raw.shape[:-1]
    raw2d = _predecode(raw.reshape(-1, raw.shape[-1]), acq.bit_depth,
                       cfg.bitshift)
    mag = _fused_depth_scale_impl(
        raw2d, depth_op_re, depth_op_im, mean2,
        bit_depth=acq.bit_depth, bitshift=cfg.bitshift,
        compute_dtype=cfg.compute_dtype,
        precision=_effective_precision(cfg.compute_dtype,
                                       cfg.matmul_precision),
        log_scaling=cfg.log_scaling,
        gmin=cfg.grayscale_min, gmax=cfg.grayscale_max, addend=cfg.addend,
        coeff=cfg.multiplicator, output_dtype=cfg.output_dtype,
        fold_concat=cfg.fold_concat, fast_log=cfg.fast_log,
        k_split=cfg.fold_k_split, max_tile=cfg.pallas_tile,
        interpret=interpret)
    return mag.reshape(*lead_shape, mag.shape[-1])


def fused_depth_transform(
    raw: jnp.ndarray,
    depth_op_re: jnp.ndarray,
    depth_op_im: jnp.ndarray,
    acq: AcqParams,
    cfg: ProcConfig,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw uint lines -> truncated depth profiles in one Pallas pass
    (stages 1-4 + IFFT + truncation).  Returns PLANAR (re, im) float32
    (..., half) -- no complex64 is ever constructed."""
    if depth_op_re is None or depth_op_im is None:
        raise ValueError(
            "cfg.fft_via_matmul is set but curves.depth_op_* is None -- "
            "build the curves with the same config (make_curves(acq, cfg, ...))")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead_shape = raw.shape[:-1]
    raw2d = _predecode(raw.reshape(-1, raw.shape[-1]), acq.bit_depth, cfg.bitshift)
    if cfg.fold_backend == "xla":
        # plain-XLA route: same operator, jnp matmuls; XLA fuses the integer
        # decode into the GEMM operand read.  Direct uintN->f32 cast: the
        # int32 hop is a Mosaic-only workaround and is itself UNIMPLEMENTED
        # on the axon backend.
        from ..ops.convert import decode
        x = raw2d if raw2d.dtype == jnp.float32 else decode(
            raw2d, acq.bit_depth, cfg.bitshift)
        if cfg.compute_dtype == "bfloat16":
            x = x.astype(jnp.bfloat16)
            depth_op_re = depth_op_re.astype(jnp.bfloat16)
            depth_op_im = depth_op_im.astype(jnp.bfloat16)
        parts = (_SPLIT_PARTS.get(cfg.matmul_precision)
                 if cfg.compute_dtype != "bfloat16" else None)
        if parts:
            # same manual multi-pass split as the Pallas path, so "high"/
            # "highest" output is backend-independent (XLA's own HIGH/
            # HIGHEST lowerings differ per backend and HIGHEST wedges the
            # axon tunnel)
            re = _dot_split(x, _split_bf16(depth_op_re, parts))
            im = _dot_split(x, _split_bf16(depth_op_im, parts))
        else:
            prec = _precision(_effective_precision(cfg.compute_dtype,
                                                   cfg.matmul_precision))
            re = jnp.matmul(x, depth_op_re,
                            preferred_element_type=jnp.float32,
                            precision=prec)
            im = jnp.matmul(x, depth_op_im,
                            preferred_element_type=jnp.float32,
                            precision=prec)
    else:
        re, im = _fused_depth_impl(raw2d, depth_op_re, depth_op_im,
                                   bit_depth=acq.bit_depth, bitshift=cfg.bitshift,
                                   compute_dtype=cfg.compute_dtype,
                                   precision=_effective_precision(
                                       cfg.compute_dtype,
                                       cfg.matmul_precision),
                                   max_tile=cfg.pallas_tile,
                                   interpret=interpret)
    half = re.shape[-1]
    return re.reshape(*lead_shape, half), im.reshape(*lead_shape, half)


def fused_prep(
    raw: jnp.ndarray,
    prep_operator: jnp.ndarray,
    phase: Optional[jnp.ndarray],
    acq: AcqParams,
    cfg: ProcConfig,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Stages 1-3 of the pipeline in one Pallas pass.

    raw: uint (..., n_in); prep_operator: float32 (n_in, n_out) from
    :func:`build_prep_operator`; phase: complex64 (n_out,) phasor or None.
    Returns complex64 (phase given) or float32 (..., n_out).
    """
    if prep_operator is None:
        raise ValueError(
            "cfg.use_pallas_prep is set but curves.prep_operator is None -- "
            "build the curves with the same config (make_curves(acq, cfg, ...))")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead_shape = raw.shape[:-1]
    n_in = raw.shape[-1]
    raw2d = _predecode(raw.reshape(-1, n_in), acq.bit_depth, cfg.bitshift)
    if phase is not None:
        cos_row = jnp.real(phase).reshape(1, -1)
        sin_row = jnp.imag(phase).reshape(1, -1)
    else:
        cos_row = sin_row = None
    out = _fused_prep_impl(raw2d, prep_operator, cos_row, sin_row,
                           bit_depth=acq.bit_depth, bitshift=cfg.bitshift,
                           precision=_effective_precision(
                               cfg.compute_dtype, cfg.matmul_precision),
                           compute_dtype=cfg.compute_dtype,
                           max_tile=cfg.pallas_tile,
                           interpret=interpret)
    return out.reshape(*lead_shape, out.shape[-1])
