"""Headline benchmark: equivalent A-scan rate of the full FD-OCT chain.

Workload mirrors the reference's published benchmark (BASELINE.md): the
1024 x 512 x 256 volume of 12-bit samples, full pipeline — cubic
k-linearization, spectral windowing, numerical dispersion compensation,
fixed-pattern-noise removal (determined once), mirror-artifact truncation
and logarithmic dynamic-range scaling
(/root/reference/performance/v180/performance_v180.md:20-52).

Measures steady-state device throughput: raw buffers pre-staged in HBM
(the streaming runtime keeps the feed ahead of compute; see
octproz_tpu/runtime.py), per-buffer jitted step, wall clock over many
buffers after warmup.  Prints ONE json line.

Backend strategy: tries the hand-fused Pallas fold kernel first, falls back
to the plain-XLA fold (same operator, jnp matmuls) if the Pallas path fails
on the current backend.  Both run the whole pre-FPN chain as one planar
GEMM (pallas/fused_prep.build_depth_operator) — the TPU-native formulation.

Baseline: 3.40 MHz A-scans/s — reference v1.8.0 on a GTX 1080 without live
3D view (README.md:48-53), the headline number of the reference.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


BASELINE_MHZ = 3.40


def _run(cfg, n_iters: int = 40) -> float:
    import jax
    import jax.numpy as jnp

    from octproz_tpu import curves as curves_mod
    from octproz_tpu import pipeline
    from octproz_tpu.params import AcqParams, WindowType

    acq = AcqParams(samples_per_line=1024, ascans_per_bscan=512,
                    bscans_per_buffer=256, buffers_per_volume=1, bit_depth=12)
    curves = curves_mod.make_curves(
        acq, cfg,
        resample_coeffs=(0.0, float(acq.samples_per_line - 1), 20.0, -10.0),
        dispersion_coeffs=(0.0, 0.0, 10.0, 0.0),
        window_type=WindowType.HANNING,
    )
    state = pipeline.initial_fpn_state(acq)

    # Pre-stage distinct raw buffers in HBM (ring of 4, like the reference's
    # pinned double buffer feeding the 8-stream pipeline).  Generated on
    # device: uploads only PRNG keys, keeping tunnel-transfer exposure near
    # zero on tunneled backends.
    @jax.jit
    def gen(key):
        return jax.random.randint(key, acq.buffer_shape, 0, 4096,
                                  dtype=jnp.int32).astype(jnp.uint16)

    ring = [gen(jax.random.PRNGKey(i)) for i in range(4)]
    jax.block_until_ready(ring)

    step = pipeline.make_step(acq, cfg)

    # Warmup: compile + FPN determination; materialize to prove execution.
    out, state = step(ring[0], curves, state)
    float(np.asarray(out[0, 0, 5]))  # raises if the backend cannot execute

    # Timed steady-state run, time-budgeted (slow backends run fewer iters).
    # Every step's output feeds a scalar accumulator that is fetched to host
    # once at the end, so the measurement is robust even on backends where
    # block_until_ready does not guarantee execution.
    acc = jnp.zeros((), jnp.float32)
    done = 0
    t0 = time.perf_counter()
    while done < n_iters:
        chunk = min(4, n_iters - done)
        for i in range(chunk):
            out, state = step(ring[(done + i) % len(ring)], curves, state)
            acc = acc + out[0, 0, 5]
        done += chunk
        float(np.asarray(acc))  # sync point inside the timed region
        if time.perf_counter() - t0 > 60.0 and done >= 4:
            break
    elapsed = time.perf_counter() - t0
    return done * acq.ascans_per_buffer / elapsed / 1e6


def main() -> None:
    import os

    if os.environ.get("OCTPROZ_BENCH_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    from octproz_tpu.cli import enable_compilation_cache
    from octproz_tpu.params import FpnMode, Interpolation, ProcConfig

    enable_compilation_cache()

    base = ProcConfig(
        bitshift=True,
        resampling=True, interpolation=Interpolation.CUBIC,
        windowing=True, dispersion=True,
        fpn_mode=FpnMode.ONCE, bscans_for_noise=1,
        log_scaling=True,
        fft_via_matmul=True,
    )
    rate_mhz = None
    backend_used = None
    # the axon tunnel throws spurious UNIMPLEMENTED errors under load --
    # retry each backend before falling back
    attempts = (("xla",) if os.environ.get("OCTPROZ_BENCH_FORCE_CPU")
                else ("pallas", "pallas", "xla", "xla", "xla"))
    for backend in attempts:
        try:
            rate_mhz = _run(dataclasses.replace(base, fold_backend=backend))
            backend_used = backend
            break
        except Exception as e:
            print(f"bench: fold_backend={backend} failed: "
                  f"{type(e).__name__}: {str(e)[:120]}", file=sys.stderr)
            time.sleep(5)
    if rate_mhz is None:
        # last resort: an honest CPU measurement (clearly labeled) beats no
        # record when the accelerator backend is down.  Fresh process: the
        # platform cannot be switched after backend initialization.
        import os
        import subprocess

        print("bench: accelerator unavailable; measuring on CPU", file=sys.stderr)
        env = dict(os.environ, OCTPROZ_BENCH_FORCE_CPU="1")
        result = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                env=env, capture_output=True, text=True,
                                timeout=3600)
        sys.stderr.write(result.stderr)
        sys.stdout.write(result.stdout)
        raise SystemExit(result.returncode)

    import jax

    platform = jax.devices()[0].platform

    print(json.dumps({
        "metric": "equivalent_ascan_rate",
        "value": round(rate_mhz, 3),
        "unit": "MHz",
        "vs_baseline": round(rate_mhz / BASELINE_MHZ, 3),
        "fold_backend": backend_used,
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
