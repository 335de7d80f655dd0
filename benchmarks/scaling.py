"""Sharded-throughput scaling benchmark.

Measures steady-state per-buffer throughput of the sharded step
(octproz_tpu.parallel.make_sharded_step) over increasing mesh sizes and
reports scaling efficiency vs linear -- the harness for the BASELINE
multi-chip targets (>85% linear scaling to 2 hosts).

On real hardware run as-is (all local devices).  Without hardware, run on a
virtual CPU mesh to validate the mechanics:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --virtual

(virtual devices share host cores, so CPU "scaling" measures partitioning
overhead, not speedup).  Prints one JSON line per mesh size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_scaling(mesh_sizes, acq, cfg, n_iters: int = 20, warmup: int = 2):
    import jax
    import jax.numpy as jnp

    from octproz_tpu import curves as curves_mod, pipeline
    from octproz_tpu.parallel import make_mesh, make_sharded_step

    curves = curves_mod.make_curves(
        acq, cfg, resample_coeffs=(0.0, float(acq.samples_per_line - 1), 10.0, -4.0),
        dispersion_coeffs=(0.0, 0.0, 8.0, 0.0))
    rng = np.random.default_rng(0)
    raw_np = rng.integers(0, 4095, size=acq.buffer_shape).astype(np.uint16)

    results = []
    base_rate = None
    for n_dev in mesh_sizes:
        mesh = make_mesh(n_dev, 1, devices=jax.devices()[:n_dev])
        step = make_sharded_step(acq, cfg, mesh)
        state = pipeline.initial_fpn_state(acq)
        raw = jax.device_put(
            jnp.asarray(raw_np),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("bscan", "ascan", None)))
        for _ in range(warmup):
            out, state = step(raw, curves, state)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out, state = step(raw, curves, state)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rate = n_iters * acq.ascans_per_buffer / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n_dev / mesh_sizes[0])
        rec = {"devices": n_dev, "ascans_per_s": round(rate, 1),
               "ms_per_buffer": round(dt / n_iters * 1e3, 2),
               "scaling_efficiency": round(eff, 3)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--virtual", action="store_true",
                   help="force an 8-device virtual CPU mesh")
    p.add_argument("--samples", type=int, default=1024)
    p.add_argument("--ascans", type=int, default=128)
    p.add_argument("--bscans", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    if args.virtual:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax

    from octproz_tpu.params import AcqParams, FpnMode, Interpolation, ProcConfig

    n_avail = len(jax.devices())
    mesh_sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    acq = AcqParams(samples_per_line=args.samples, ascans_per_bscan=args.ascans,
                    bscans_per_buffer=args.bscans, bit_depth=12)
    cfg = ProcConfig(bitshift=True, resampling=True,
                     interpolation=Interpolation.CUBIC, windowing=True,
                     dispersion=True, fpn_mode=FpnMode.ONCE, log_scaling=True,
                     fft_via_matmul=True,
                     fold_backend="xla" if args.virtual else "pallas")
    run_scaling(mesh_sizes, acq, cfg, n_iters=args.iters)


if __name__ == "__main__":
    main()
