"""ENGINE_r04: the StreamingEngine itself sustaining a rate on the real
chip, measured by its own live counter (VERDICT r3 #5).

The reference's published MHz comes from its engine's 5-second info-box
counter while streaming (processing.cpp:193-207) — not from a bespoke
bench loop.  This script reproduces that methodology here: one
subprocess-guarded `octproz_tpu replay` session per wire format on the
TPU (full benchmark geometry, chunked batch dispatch, prefetch thread +
pipelined H2D upload thread + in-flight window all engaged), capturing
every throughput window via --metrics-json, and records the result as
ENGINE_r04.json.

Run: python scripts/engine_run_tpu.py [--buffers N] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


from octproz_tpu.utils.tunnel import wait_tunnel as _wait_tunnel


def wait_tunnel(max_wait_s: float = 1800.0) -> bool:
    return _wait_tunnel(max_wait_s, label="engine_run: tunnel")


def make_input(tmp: str, packed: bool) -> str:
    """One full-geometry buffer on disk (VirtualOctSource cycles it)."""
    from octproz_tpu import native

    rng = np.random.default_rng(0)
    buf = rng.integers(0, 4096, size=(256, 512, 1024)).astype(np.uint16)
    if packed:
        path = os.path.join(tmp, "engine_in_packed.raw")
        native.pack_uint12(buf.reshape(-1)).tofile(path)
    else:
        path = os.path.join(tmp, "engine_in.raw")
        buf.tofile(path)
    return path


def run_session(path: str, wire: str, buffers: int, timeout_s: float,
                tmp: str):
    metrics = os.path.join(tmp, f"engine_windows_{wire}.jsonl")
    argv = [sys.executable, "-m", "octproz_tpu", "replay", path,
            "--samples", "1024", "--ascans", "512", "--bscans", "256",
            "--bit-depth", "12", "--bitshift",
            "--interpolation", "cubic", "--fpn", "once", "--fpn-bscans", "1",
            "--fft-matmul", "--compute-dtype", "bfloat16",
            "--output-dtype", "bfloat16",
            "--chunk", "8", "--chunk-strategy", "auto",
            "--max-buffers", str(buffers),
            "--metrics-window", "5", "--metrics-json", metrics]
    if wire == "packed12":
        argv += ["--packed-12bit", "--keep-packed",
                 "--wire-format", "packed12"]
    t0 = time.perf_counter()
    try:
        r = subprocess.run(argv, capture_output=True, text=True,
                           timeout=timeout_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"wire": wire, "error": "timeout"}
    elapsed = time.perf_counter() - t0
    if r.returncode != 0 or not r.stdout.strip():
        tail = (r.stderr or "").strip().splitlines()[-2:]
        return {"wire": wire, "error": " | ".join(tail)[:300]}
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    windows = []
    if os.path.exists(metrics):
        with open(metrics) as f:
            windows = [json.loads(line) for line in f]
    return {
        "wire": wire,
        "cli": " ".join(argv[2:]),
        "buffers_processed": rep["buffers_processed"],
        "wall_s": round(elapsed, 1),
        "overall_ascans_per_s": rep["ascans_per_s"],
        "overall_mhz": round(rep["ascans_per_s"] / 1e6, 4),
        "windows": windows,
        "best_window_mhz": (round(max(w["ascans_per_s"] for w in windows)
                                  / 1e6, 4) if windows else None),
        "last_window": rep.get("last_window"),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--buffers", type=int, default=36)
    p.add_argument("--out", default=os.path.join(REPO, "ENGINE_r04.json"))
    p.add_argument("--timeout", type=float, default=1500.0)
    p.add_argument("--tmp", default="/tmp/engine_r04")
    args = p.parse_args()
    os.makedirs(args.tmp, exist_ok=True)

    report = {
        "methodology": (
            "octproz_tpu replay (the streaming engine: prefetch thread, "
            "pipelined H2D upload thread, chunked batch dispatch, bounded "
            "in-flight window) on the real TPU, rate measured by the "
            "engine's own 5 s ThroughputMeter windows — the reference's "
            "live-counter protocol (processing.cpp:193-207)"),
        "geometry": "1024x512x256, 12-bit, full chain (cubic k-lin, "
                    "window, dispersion, FPN once, log), bf16 batch-stream",
        "sessions": [],
    }
    for wire in ("uint16", "packed12"):
        if not wait_tunnel():
            report["sessions"].append({"wire": wire,
                                       "error": "tunnel never revived"})
            continue
        path = make_input(args.tmp, wire == "packed12")
        print(f"engine_run: {wire} session...", file=sys.stderr)
        report["sessions"].append(
            run_session(path, wire, args.buffers, args.timeout, args.tmp))
        time.sleep(5)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
