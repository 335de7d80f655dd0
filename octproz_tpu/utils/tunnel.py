"""Tunnel liveness policy, shared by every hardware harness.

The remote accelerator link wedges transiently (minutes to tens of
minutes) and a wedged device op poisons its whole process (CLAUDE.md), so
every harness probes liveness in a THROWAWAY subprocess and waits for
revival between attempts.  One implementation here — bench.py,
benchmarks/h2d_diag.py and scripts/engine_run_tpu.py all import it so the
liveness policy cannot drift between harnesses.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

#: default cap on one revival wait; overridable via env (wedges >30 min
#: have been observed — giving up too early costs a hardware datapoint)
DEFAULT_MAX_WAIT_S = float(os.environ.get("OCTPROZ_TUNNEL_WAIT", "1800"))


def tunnel_alive(timeout_s: float = 90.0) -> bool:
    """Probe device-op liveness in a throwaway subprocess (enumeration
    works even when execution hangs; a wedged probe must not wedge the
    caller)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(jnp.ones(4).sum())"],
            capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_tunnel(max_wait_s: float | None = None, *,
                poll_sleep_s: float = 60.0,
                label: str = "tunnel") -> bool:
    """Wait (bounded) for the tunnel to revive; True once alive."""
    if max_wait_s is None:
        max_wait_s = DEFAULT_MAX_WAIT_S
    t0 = time.monotonic()
    while True:
        if tunnel_alive():
            return True
        if time.monotonic() - t0 >= max_wait_s:
            return False
        print(f"{label}: unresponsive; waiting for revival",
              file=sys.stderr)
        time.sleep(poll_sleep_s)
