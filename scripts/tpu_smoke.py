"""TPU Pallas smoke test: compile + run the Mosaic kernels on the real chip.

The test suite exercises the Pallas kernels only in interpret mode (CPU), so
a Mosaic regression would otherwise surface only as a silent bench fallback
from "pallas" to "xla".  This script makes it loud: it compiles and executes
the hand-fused kernels NON-interpreted on the TPU and asserts agreement with
the plain-XLA fold of the same operators:

  * fused_prep          — decode + folded prep GEMM + phasor epilogue
                          (analog of cuda_code.cu:413-489)
  * fused_depth_transform — decode + full-fold depth GEMMs
  * fused_depth_scale   — the steady-state single-pass kernel
                          (GEMM + FPN subtraction + log scaling)

Per CLAUDE.md, every TPU attempt runs in a fresh subprocess under a hard
timeout (the tunneled backend can wedge a process; a wedged attempt must
not take the driver down).  Prints ONE json line; exit 0 == all kernels
compiled and matched.

    python scripts/tpu_smoke.py [--out TPU_SMOKE.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL = 1e-3


def _attempt() -> None:
    from octproz_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from octproz_tpu import curves as curves_mod
    from octproz_tpu.params import AcqParams, FpnMode, Interpolation, ProcConfig, WindowType
    from octproz_tpu.pallas.fused_prep import (fused_depth_scale,
                                               fused_depth_transform,
                                               fused_prep)

    backend = jax.default_backend()
    if backend != "tpu":
        raise SystemExit(f"tpu_smoke: backend is {backend!r}, not tpu")

    acq = AcqParams(samples_per_line=1024, ascans_per_bscan=256,
                    bscans_per_buffer=8, bit_depth=12)
    base = ProcConfig(
        bitshift=True,
        resampling=True, interpolation=Interpolation.CUBIC,
        windowing=True, dispersion=True,
        fpn_mode=FpnMode.OFF, log_scaling=True,
        fft_via_matmul=True,
    )
    cfg_pl = dataclasses.replace(base, fold_backend="pallas")
    cfg_xla = dataclasses.replace(base, fold_backend="xla")
    curves = curves_mod.make_curves(
        acq, cfg_pl,
        resample_coeffs=(0.0, float(acq.samples_per_line - 1), 20.0, -10.0),
        dispersion_coeffs=(0.0, 0.0, 10.0, 0.0),
        window_type=WindowType.HANNING)

    @jax.jit
    def gen(key):
        return jax.random.randint(key, acq.buffer_shape, 0, 4096,
                                  dtype=jnp.int32).astype(jnp.uint16)

    raw = gen(jax.random.PRNGKey(3))
    timings = {}

    def check(name, got, want):
        got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
        fin_g, fin_w = np.isfinite(got), np.isfinite(want)
        if not np.array_equal(fin_g, fin_w):
            raise AssertionError(f"{name}: finite-mask mismatch "
                                 f"({int((fin_g != fin_w).sum())} voxels)")
        err = float(np.max(np.abs(got[fin_g] - want[fin_w])))
        if err > TOL:
            raise AssertionError(f"{name}: max |err| {err:.2e} > {TOL}")
        timings[f"{name}_max_err"] = err

    # --- full-fold depth transform: pallas (non-interpret) vs xla ---------
    t0 = time.perf_counter()
    re_p, im_p = fused_depth_transform(raw, curves.depth_op_re,
                                       curves.depth_op_im, acq, cfg_pl,
                                       interpret=False)
    jax.block_until_ready(re_p)
    timings["depth_transform_compile_s"] = round(time.perf_counter() - t0, 1)
    re_x, im_x = fused_depth_transform(raw, curves.depth_op_re,
                                       curves.depth_op_im, acq, cfg_xla)
    check("depth_re", re_p, re_x)
    check("depth_im", im_p, im_x)

    # --- steady-state single-pass kernel vs xla fold + separate scale -----
    from octproz_tpu.ops.postprocess import scale_log_planar

    mean2 = jnp.zeros((2, acq.output_ascan_length), jnp.float32)
    t0 = time.perf_counter()
    mag_p = fused_depth_scale(raw, curves.depth_op_re, curves.depth_op_im,
                              mean2, acq, cfg_pl, interpret=False)
    jax.block_until_ready(mag_p)
    timings["depth_scale_compile_s"] = round(time.perf_counter() - t0, 1)
    mag_x = scale_log_planar(re_x, im_x, acq.output_ascan_length,
                             cfg_pl.grayscale_min, cfg_pl.grayscale_max,
                             cfg_pl.addend, cfg_pl.multiplicator)
    check("depth_scale", mag_p, mag_x)

    # --- stages-1-3 prep kernel vs the unfused op chain -------------------
    cfg_prep = dataclasses.replace(base, fft_via_matmul=False,
                                   use_pallas_prep=True)
    curves_prep = curves_mod.make_curves(
        acq, cfg_prep,
        resample_coeffs=(0.0, float(acq.samples_per_line - 1), 20.0, -10.0),
        dispersion_coeffs=(0.0, 0.0, 10.0, 0.0),
        window_type=WindowType.HANNING)
    t0 = time.perf_counter()
    spec_p = fused_prep(raw, curves_prep.prep_operator, curves_prep.phase,
                        acq, cfg_prep, interpret=False)
    jax.block_until_ready(spec_p)
    timings["prep_compile_s"] = round(time.perf_counter() - t0, 1)
    from octproz_tpu import pipeline as _pipeline
    cfg_unfused = dataclasses.replace(cfg_prep, use_pallas_prep=False)
    spec_x = _pipeline.prep_spectra(raw, curves_prep, acq, cfg_unfused)
    check("prep_re", jnp.real(spec_p), jnp.real(spec_x))
    check("prep_im", jnp.imag(spec_p), jnp.imag(spec_x))

    print(json.dumps(dict({"tpu_pallas_smoke": "pass",
                           "tolerance": TOL}, **timings)))


def main() -> None:
    if os.environ.get("OCTPROZ_SMOKE_ATTEMPT"):
        _attempt()
        return

    import argparse
    import subprocess

    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None, help="also write the JSON here")
    p.add_argument("--timeout", type=float,
                   default=float(os.environ.get("OCTPROZ_SMOKE_TIMEOUT", "900")))
    args = p.parse_args()

    env = dict(os.environ, OCTPROZ_SMOKE_ATTEMPT="1")
    try:
        result = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=args.timeout)
        stdout, stderr, rc = result.stdout, result.stderr, result.returncode
    except subprocess.TimeoutExpired as e:
        stdout = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
            else (e.stdout or "")
        stderr = "timeout"
        rc = -1

    if rc == 0 and stdout.strip():
        line = stdout.strip().splitlines()[-1]
    else:
        tail = " ".join((stderr or "").strip().splitlines()[-1:])[:200]
        line = json.dumps({"tpu_pallas_smoke": "fail", "error": tail})
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    raise SystemExit(0 if json.loads(line).get("tpu_pallas_smoke") == "pass"
                     else 1)


if __name__ == "__main__":
    main()
