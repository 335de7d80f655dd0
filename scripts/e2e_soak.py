"""E2E soak: engine/upload-only ratio DISTRIBUTION across link states.

VERDICT r4 weak #2: the round-4 claim that the streaming engine adds no
feed overhead rested on one lucky first window (engine 87 % of an
upload-only baseline measured minutes earlier).  This harness makes the
claim distributional: a long session of CYCLES, each cycle measuring — in
ONE process, back to back, with SYMMETRIC window lengths —

    upload-only window (runtime._DeviceFeeder, no compute)
    engine window      (full StreamingEngine, pipelined H2D + chunked
                        dispatch, counted by wall clock over processed
                        buffers)
    upload-only window (brackets the link state)

and reporting ratio = engine / mean(bracketing uploads) per cycle, then
the median/p10 across cycles.  Window symmetry matters: the tunnel's H2D
link has a ~2 GB burst window then collapses ~10x (H2D_DIAG.json), so an
asymmetric comparison (30 s upload vs 300 s engine) conflates link decay
with engine overhead — exactly the round-4 artifact's failure mode.

Each cycle runs in a FRESH subprocess under a hard timeout (the tunnel
wedges processes; CLAUDE.md), with tunnel-revival waits between cycles.
The reference counterpart of the instrument is the live 5 s counter
(processing.cpp:193-207).

    python scripts/e2e_soak.py --minutes 40 --out E2E_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_cycle(window_s: float, chunk: int, wire: str,
              small: bool = False) -> dict:
    """One soak cycle in THIS process; prints nothing, returns the record."""
    import numpy as np

    import jax

    from octproz_tpu.cli import enable_compilation_cache
    from octproz_tpu.models.fdoct import FdOctModel
    from octproz_tpu.params import (AcqParams, FpnMode, Interpolation,
                                    ProcConfig, WindowType)
    from octproz_tpu.runtime import StreamingEngine, _DeviceFeeder, _Prefetcher

    enable_compilation_cache()
    if small:  # CPU smoke geometry (tests) — benchmark geometry otherwise
        jax.config.update("jax_platforms", "cpu")
        acq = AcqParams(samples_per_line=256, ascans_per_bscan=32,
                        bscans_per_buffer=8, buffers_per_volume=1,
                        bit_depth=12)
    else:
        acq = AcqParams(samples_per_line=1024, ascans_per_bscan=512,
                        bscans_per_buffer=256, buffers_per_volume=1,
                        bit_depth=12)
    cfg = ProcConfig(bitshift=True, resampling=True,
                     interpolation=Interpolation.CUBIC, windowing=True,
                     dispersion=True, fpn_mode=FpnMode.ONCE,
                     bscans_for_noise=1, log_scaling=True,
                     fft_via_matmul=True, compute_dtype="bfloat16",
                     output_dtype="bfloat16")
    model = FdOctModel(
        acq, cfg,
        resample_coeffs=(0.0, float(acq.samples_per_line - 1), 20.0, -10.0),
        dispersion_coeffs=(0.0, 0.0, 10.0, 0.0),
        window_type=WindowType.HANNING)

    rng = np.random.default_rng(0)
    ring = [rng.integers(0, 4096, size=acq.buffer_shape).astype(np.uint16)
            for _ in range(3)]
    if wire == "packed12":
        from octproz_tpu import native

        ring = [native.pack_uint12(b.reshape(-1)) for b in ring]

    class _HostRing:
        def buffers(self):
            i = 0
            while True:
                yield ring[i % len(ring)]
                i += 1

    def upload_window(budget_s: float):
        """Upload-only rate through the SAME feeder machinery (the put
        blocks until the tunnel transfer completes, so feeder.get
        returning IS the per-buffer completion)."""
        pre = _Prefetcher(_HostRing(), 2)
        feeder = _DeviceFeeder(pre, model, depth=2, wire_format=wire)
        pre.start()
        feeder.start()
        n = 0
        t0 = time.perf_counter()
        try:
            while time.perf_counter() - t0 < budget_s:
                item = feeder.get(poll=0.1)
                if item is None:
                    break
                jax.block_until_ready(item[1])
                n += 1
        finally:
            elapsed = time.perf_counter() - t0
            feeder.stop()
            pre.stop()
        return n * acq.ascans_per_buffer / elapsed / 1e6, n

    # compile warmups OUTSIDE every timed window (per-buffer step incl.
    # FPN determination, then the chunk executable)
    import jax.numpy as jnp

    dev0 = (model.put_packed_buffer(ring[0]) if wire == "packed12"
            else ring[0])
    model.process_buffer(dev0)
    if chunk > 1:
        stack0 = (jnp.stack([model.put_packed_buffer(ring[0])] * chunk)
                  if wire == "packed12" else np.stack([ring[0]] * chunk))
        jax.block_until_ready(model.process_chunk(stack0))
    float(np.asarray(model.fpn_state.mean_line).ravel()[0])  # real sync

    up1_mhz, n1 = upload_window(window_s)

    # engine window: wall-clock over processed buffers, watchdog-stopped
    import threading

    windows = []
    eng = StreamingEngine(model, _HostRing(), upload_prefetch=True,
                          prefetch_depth=2, dispatch_chunk=chunk,
                          chunk_strategy="auto", metrics_window_s=5.0,
                          wire_format=wire,
                          on_metrics=lambda s: windows.append(
                              round(s.ascans_per_s / 1e6, 4)))
    watchdog = threading.Timer(window_s, eng.stop)
    watchdog.daemon = True
    t0 = time.perf_counter()
    watchdog.start()
    done = eng.run()
    watchdog.cancel()
    eng_elapsed = time.perf_counter() - t0
    eng_mhz = done * acq.ascans_per_buffer / eng_elapsed / 1e6

    up2_mhz, n2 = upload_window(window_s)

    ups = [u for u in (up1_mhz, up2_mhz) if u > 0]
    base = sum(ups) / len(ups) if ups else 0.0
    return {
        "t": round(time.time(), 1),
        "wire": wire,
        "chunk": chunk,
        "window_s": window_s,
        "upload_before_mhz": round(up1_mhz, 4),
        "upload_after_mhz": round(up2_mhz, 4),
        "upload_buffers": n1 + n2,
        "engine_mhz": round(eng_mhz, 4),
        "engine_buffers": done,
        "engine_meter_windows_mhz": windows,
        "ratio": round(eng_mhz / base, 3) if base else None,
    }


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--minutes", type=float, default=40.0)
    p.add_argument("--window-s", type=float, default=45.0)
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--wire", default="packed12",
                   choices=["uint16", "packed12"])
    p.add_argument("--out", default="E2E_r05.json")
    p.add_argument("--cycle", action="store_true",
                   help="internal: run one cycle and print its JSON")
    p.add_argument("--small", action="store_true",
                   help="tiny geometry on the CPU backend (smoke test)")
    args = p.parse_args()

    if args.cycle:
        print(json.dumps(run_cycle(args.window_s, args.chunk, args.wire,
                                   small=args.small)))
        return 0

    from octproz_tpu.utils.tunnel import wait_tunnel

    deadline = time.time() + args.minutes * 60
    cycles, failures = [], 0
    cycle_timeout = args.window_s * 3 + 420  # 3 windows + compile slack
    while time.time() < deadline:
        if not wait_tunnel(600.0, label="soak: tunnel"):
            failures += 1
            continue
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cycle",
                 "--window-s", str(args.window_s), "--chunk",
                 str(args.chunk), "--wire", args.wire],
                capture_output=True, text=True, timeout=cycle_timeout)
        except subprocess.TimeoutExpired:
            failures += 1
            print("soak: cycle timed out (wedged tunnel?)", file=sys.stderr)
            continue
        if r.returncode != 0 or not r.stdout.strip():
            failures += 1
            tail = (r.stderr or "").strip().splitlines()[-1:]
            print(f"soak: cycle failed: {' '.join(tail)[:160]}",
                  file=sys.stderr)
            time.sleep(10)
            continue
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        cycles.append(rec)
        print(json.dumps(rec), flush=True)

    ratios = sorted(c["ratio"] for c in cycles if c.get("ratio") is not None)

    def pct(p):
        if not ratios:
            return None
        return ratios[min(int(p / 100 * len(ratios)), len(ratios) - 1)]

    report = {
        "protocol": "per-cycle engine/upload-only ratio with SYMMETRIC "
                    "adjacent windows (upload, engine, upload) in one "
                    "process; fresh subprocess per cycle; see "
                    "scripts/e2e_soak.py",
        "wire": args.wire, "chunk": args.chunk,
        "window_s": args.window_s,
        "cycles": len(cycles), "failed_cycles": failures,
        "ratio_median": pct(50), "ratio_p10": pct(10),
        "ratio_min": ratios[0] if ratios else None,
        "ratio_max": ratios[-1] if ratios else None,
        "upload_mhz_range": [
            round(min(min(c["upload_before_mhz"], c["upload_after_mhz"])
                      for c in cycles), 4),
            round(max(max(c["upload_before_mhz"], c["upload_after_mhz"])
                      for c in cycles), 4)] if cycles else None,
        "records": cycles,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "records"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
