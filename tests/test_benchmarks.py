"""Benchmark-harness smoke tests: the CPU entry points must stay runnable
(the driver runs bench.py on hardware; these harnesses are the manual
profiling surface, reference analog: the published performance protocol,
performance/v180/performance_v180.md:55-60)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_latency_harness_cpu_small():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "latency.py"),
         "--platform", "cpu", "--small", "--n", "5"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-500:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "per_buffer_latency"
    assert rec["n"] == 5 and rec["p50"] > 0
    assert rec["platform"] == "cpu"
