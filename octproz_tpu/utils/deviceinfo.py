"""Accelerator inventory report.

Capability-equivalent of the reference's ``GpuInfo``
(octproz_project/octproz/src/gpuinfo.{h,cpp}: cudaGetDeviceProperties ->
memory, SMs, clock, concurrent-kernel flags) -- here a per-device report from
the JAX backend: platform, device kind, process/local indices, and live HBM
usage from ``device.memory_stats()`` where the backend exposes it.
"""

from __future__ import annotations

from typing import Any, Dict, List


def device_report() -> List[Dict[str, Any]]:
    import jax

    out: List[Dict[str, Any]] = []
    for d in jax.devices():
        info: Dict[str, Any] = {
            "id": d.id,
            "platform": d.platform,
            "device_kind": d.device_kind,
            "process_index": d.process_index,
        }
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        if stats:
            limit = stats.get("bytes_limit")
            in_use = stats.get("bytes_in_use")
            if limit is not None:
                info["memory_limit_mb"] = round(limit / 1e6, 1)
            if in_use is not None:
                info["memory_in_use_mb"] = round(in_use / 1e6, 1)
        out.append(info)
    return out


def format_report() -> str:
    lines = []
    for info in device_report():
        parts = [f"device {info['id']}: {info['device_kind']} ({info['platform']})"]
        if "memory_limit_mb" in info:
            parts.append(f"{info.get('memory_in_use_mb', 0.0):.0f}/"
                         f"{info['memory_limit_mb']:.0f} MB HBM")
        lines.append(", ".join(parts))
    return "\n".join(lines)
