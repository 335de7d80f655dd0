"""Diagnose the host->device feed path on the real chip.

Round-3 left a 40x contradiction inside BENCH_r03.json: the 3-upload
bandwidth probe implied 0.22 s per 268 MB raw buffer (1.2 GB/s), but the
e2e loop (device_put + per-buffer step + bounded probe fetches) sustained
9.3 s per buffer.  This script isolates the feed path's components, one
stage per fresh subprocess (a wedged tunnel op poisons its whole process,
CLAUDE.md), each under a hard timeout:

  upload_series   N sequential device_put(268 MB)+block: warm-up vs
                  steady-state per-upload seconds (is 1.2 GB/s sustained,
                  or a warm burst?)
  upload_async    enqueue N device_puts, block at the end: does the tunnel
                  pipeline transfers at all?
  upload_sliced   same bytes as B-scan slices (8 x 33.5 MB): per-transfer
                  overhead vs throughput.
  step_latency    device-resident per-buffer step (chunk=1) timed alone:
                  the dispatch-latency term of the e2e loop.
  interleaved     the round-3 e2e loop shape (upload -> step -> bounded
                  probe fetch), per-iteration breakdown: WHERE do the
                  9.3 s/buffer go?
  overlap         upload thread + compute thread concurrently: can the
                  link and the MXU run at the same time on this tunnel?

Usage: python benchmarks/h2d_diag.py [--stages s1,s2] [--out FILE]
Each stage prints one JSON object; the parent collects them into one
report (default H2D_DIAG.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
BUF_SHAPE = (256, 512, 1024)  # the headline buffer: 268.4 MB uint16
BUF_BYTES = int(np.prod(BUF_SHAPE)) * 2


def _cfg():
    from octproz_tpu.params import FpnMode, Interpolation, ProcConfig

    return ProcConfig(
        bitshift=True, resampling=True, interpolation=Interpolation.CUBIC,
        windowing=True, dispersion=True, fpn_mode=FpnMode.ONCE,
        bscans_for_noise=1, log_scaling=True, fft_via_matmul=True,
        compute_dtype="bfloat16", output_dtype="bfloat16")


def _setup_step():
    import jax.numpy as jnp

    from octproz_tpu import curves as curves_mod, pipeline
    from octproz_tpu.params import AcqParams, WindowType

    acq = AcqParams(samples_per_line=1024, ascans_per_bscan=512,
                    bscans_per_buffer=256, buffers_per_volume=1, bit_depth=12)
    cfg = _cfg()
    curves = curves_mod.make_curves(
        acq, cfg, resample_coeffs=(0.0, 1023.0, 20.0, -10.0),
        dispersion_coeffs=(0.0, 0.0, 10.0, 0.0),
        window_type=WindowType.HANNING)
    state = pipeline.initial_fpn_state(acq)
    step = pipeline.make_step(acq, cfg)
    return acq, cfg, curves, state, step


def _host_ring(n=3):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 4096, size=BUF_SHAPE).astype(np.uint16)
            for _ in range(n)]


# ---------------------------------------------------------------------------
# stages (run inside the child process)
# ---------------------------------------------------------------------------

def stage_upload_series():
    import jax

    ring = _host_ring(3)
    times = []
    for i in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(ring[i % 3]))
        times.append(round(time.perf_counter() - t0, 4))
    steady = times[2:]
    return {"per_upload_s": times,
            "steady_gbps": round(BUF_BYTES * len(steady) / sum(steady) / 1e9, 3)}


def stage_upload_async():
    import jax

    ring = _host_ring(3)
    # enqueue everything, then block: measures whether device_put calls
    # themselves serialize (a blocking call shows no speedup vs series)
    t0 = time.perf_counter()
    devs = [jax.device_put(ring[i % 3]) for i in range(6)]
    t_enqueue = time.perf_counter() - t0
    jax.block_until_ready(devs)
    t_total = time.perf_counter() - t0
    return {"enqueue_s": round(t_enqueue, 4), "total_s": round(t_total, 4),
            "gbps": round(6 * BUF_BYTES / t_total / 1e9, 3)}


def stage_upload_sliced():
    import jax

    ring = _host_ring(2)
    slices = [np.ascontiguousarray(b) for b in np.split(ring[0], 8)] \
        + [np.ascontiguousarray(b) for b in np.split(ring[1], 8)]
    # warm
    jax.block_until_ready(jax.device_put(slices[0]))
    t0 = time.perf_counter()
    devs = [jax.device_put(s) for s in slices]
    jax.block_until_ready(devs)
    dt = time.perf_counter() - t0
    return {"n_slices": len(slices),
            "slice_mb": round(slices[0].nbytes / 1e6, 1),
            "total_s": round(dt, 4),
            "gbps": round(len(slices) * slices[0].nbytes / dt / 1e9, 3)}


def stage_step_latency():
    import jax

    acq, cfg, curves, state, step = _setup_step()
    ring = _host_ring(2)
    dev = [jax.device_put(r) for r in ring]
    jax.block_until_ready(dev)
    out, state = step(dev[0], curves, state)   # compile + FPN determination
    float(np.asarray(out[0, 0, 5]))
    times = []
    for i in range(8):
        t0 = time.perf_counter()
        out, state = step(dev[i % 2], curves, state)
        float(np.asarray(out[0, 0, 5]))        # full round trip, synchronous
        times.append(round(time.perf_counter() - t0, 4))
    return {"per_step_sync_s": times,
            "steady_s": round(float(np.median(times[1:])), 4)}


def stage_interleaved():
    import jax

    acq, cfg, curves, state, step = _setup_step()
    ring = _host_ring(3)
    out, state = step(jax.device_put(ring[0]), curves, state)
    float(np.asarray(out[0, 0, 5]))
    iters = []
    probes = []
    for i in range(6):
        rec = {}
        t0 = time.perf_counter()
        dev = jax.device_put(ring[i % 3])
        rec["put_return_s"] = round(time.perf_counter() - t0, 4)
        t1 = time.perf_counter()
        out, state = step(dev, curves, state)
        rec["dispatch_s"] = round(time.perf_counter() - t1, 4)
        probes.append(out[0, 0, 5])
        t2 = time.perf_counter()
        if len(probes) > 2:
            float(np.asarray(probes.pop(0)))
        rec["probe_fetch_s"] = round(time.perf_counter() - t2, 4)
        rec["iter_s"] = round(time.perf_counter() - t0, 4)
        iters.append(rec)
    t3 = time.perf_counter()
    for p in probes:
        float(np.asarray(p))
    drain_s = round(time.perf_counter() - t3, 4)
    return {"iters": iters, "final_drain_s": drain_s}


def stage_overlap():
    import threading

    import jax

    acq, cfg, curves, state, step = _setup_step()
    ring = _host_ring(3)
    dev0 = jax.device_put(ring[0])
    jax.block_until_ready(dev0)
    out, state = step(dev0, curves, state)
    float(np.asarray(out[0, 0, 5]))

    # uploader thread: 4 sequential uploads while main thread steps 4x on
    # resident data.  If the tunnel multiplexes, wall ~= max(upload, compute);
    # if it serializes (or wedges), wall ~= sum.
    upload_times = []

    def uploader():
        for i in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(ring[i % 3]))
            upload_times.append(round(time.perf_counter() - t0, 4))

    t0 = time.perf_counter()
    th = threading.Thread(target=uploader)
    th.start()
    acc = None
    st = state
    for i in range(4):
        out, st = step(dev0, curves, st)
        acc = out[0, 0, 5] if acc is None else acc + out[0, 0, 5]
    float(np.asarray(acc))
    t_compute = time.perf_counter() - t0
    th.join(timeout=600)
    t_wall = time.perf_counter() - t0
    return {"upload_s": upload_times, "compute_done_s": round(t_compute, 4),
            "wall_s": round(t_wall, 4)}


STAGES = {
    "upload_series": stage_upload_series,
    "upload_async": stage_upload_async,
    "upload_sliced": stage_upload_sliced,
    "step_latency": stage_step_latency,
    "interleaved": stage_interleaved,
    "overlap": stage_overlap,
}


def main() -> None:
    if os.environ.get("H2D_DIAG_STAGE"):
        from octproz_tpu.cli import enable_compilation_cache

        enable_compilation_cache()
        name = os.environ["H2D_DIAG_STAGE"]
        print(json.dumps({name: STAGES[name]()}))
        return

    args = sys.argv[1:]
    stages = list(STAGES)
    out_path = os.path.join(REPO, "H2D_DIAG.json")
    if "--stages" in args:
        stages = args[args.index("--stages") + 1].split(",")
    if "--out" in args:
        out_path = args[args.index("--out") + 1]

    from octproz_tpu.utils.tunnel import wait_tunnel as _wait_tunnel

    def wait_tunnel(max_wait_s: float = 3600.0) -> bool:
        return _wait_tunnel(max_wait_s, label="h2d_diag: tunnel")

    report = {"buffer_mb": round(BUF_BYTES / 1e6, 1)}
    for name in stages:
        if not wait_tunnel():
            report[name] = {"error": "tunnel never revived"}
            continue
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=dict(os.environ, H2D_DIAG_STAGE=name),
                capture_output=True, text=True, timeout=900)
            if r.returncode == 0 and r.stdout.strip():
                report.update(json.loads(r.stdout.strip().splitlines()[-1]))
                print(f"{name}: ok", file=sys.stderr)
            else:
                tail = (r.stderr or "").strip().splitlines()[-1:]
                report[name] = {"error": " ".join(tail)[:200]}
                print(f"{name}: failed", file=sys.stderr)
        except subprocess.TimeoutExpired:
            report[name] = {"error": "timeout"}
            print(f"{name}: timeout", file=sys.stderr)
        time.sleep(3)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
