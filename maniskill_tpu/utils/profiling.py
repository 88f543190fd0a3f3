"""Benchmark profiler: steps/s + device-memory accounting.

TPU-native analogue of the reference benchmark ``Profiler``
(``mani_skill/examples/benchmarking/profiling.py:23,90-113``): named timing
blocks with per-env throughput ("parallel steps/s") and device HBM stats
(XLA ``memory_stats`` replaces pynvml). Timing blocks call
``block_until_ready`` on a probe value so async dispatch doesn't fake speed.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, Optional

import jax


def device_memory_stats(device=None) -> Dict[str, float]:
    """Bytes in use / peak / limit for one device (MB). Empty dict on
    backends that don't report (CPU)."""
    dev = device or jax.local_devices()[0]
    stats = dev.memory_stats() or {}
    out = {}
    for src, dst in (
        ("bytes_in_use", "mem_use_mb"),
        ("peak_bytes_in_use", "mem_peak_mb"),
        ("bytes_limit", "mem_limit_mb"),
    ):
        if src in stats:
            out[dst] = stats[src] / 1e6
    return out


class Profiler:
    def __init__(self, output_format: str = "stdout"):
        self.output_format = output_format
        self.stats: Dict[str, Dict[str, float]] = {}

    @contextmanager
    def profile(self, name: str, total_steps: int, num_envs: int = 1,
                sync: Optional[object] = None):
        """Time a block that performs ``total_steps`` env steps over
        ``num_envs`` parallel envs. Pass the block's final device value as
        ``sync`` via :meth:`synchronize` instead when it isn't known up
        front."""
        t0 = time.perf_counter()
        yield self
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        entry = dict(
            wall_s=dt,
            steps_per_s=total_steps / dt,
            parallel_steps_per_s=total_steps * num_envs / dt,
            num_envs=num_envs,
        )
        entry.update(device_memory_stats())
        self.stats[name] = entry
        if self.output_format == "stdout":
            self.log_stats(name)

    @staticmethod
    def synchronize(value):
        """Barrier on a device value (torch.cuda.synchronize analogue)."""
        jax.block_until_ready(value)

    def log_stats(self, name: str):
        s = self.stats[name]
        parts = [f"{name}:"]
        parts.append(f"{s['steps_per_s']:.1f} steps/s")
        parts.append(
            f"{s['parallel_steps_per_s']:.1f} parallel steps/s "
            f"({int(s['num_envs'])} envs)"
        )
        if "mem_peak_mb" in s:
            parts.append(f"peak HBM {s['mem_peak_mb']:.0f} MB")
        print(" ".join(parts))

    def update_csv(self, path: str, keys=None):
        """Append one row per profiled block to a CSV (reference
        ``Profiler.update_csv``)."""
        import csv
        import os

        rows = []
        for name, s in self.stats.items():
            row = dict(name=name, **s)
            if keys:
                row = {k: row[k] for k in ("name", *keys) if k in row}
            rows.append(row)
        if not rows:
            return
        exists = os.path.exists(path)
        with open(path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            if not exists:
                w.writeheader()
            w.writerows(rows)
