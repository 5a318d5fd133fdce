"""First-class tracing/profiling (the reference only has wall-clock prints,
utils/train_module.py:210,384-388; SURVEY §5.1 plans this module).

Three layers:
  * `phase_timer` — lightweight named wall-clock phases with running stats
    (steps/sec, share-of-step percentages like the reference's "ic2xyz
    usage" print);
  * `trace` — context manager around `jax.profiler` emitting TensorBoard
    trace files when supported by the backend (gated: experimental
    platforms may not implement profiling);
  * `device_memory_stats` — per-device live/peak bytes where available.
"""

from __future__ import annotations

import collections
import contextlib
import time

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase; report() gives totals and
    share-of-total percentages."""

    def __init__(self):
        self.totals = collections.defaultdict(float)
        self.counts = collections.defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self):
        total = sum(self.totals.values()) or 1.0
        return {
            name: {
                "total_sec": round(t, 4),
                "mean_ms": round(t / max(self.counts[name], 1) * 1e3, 3),
                "share_pct": round(t / total * 100, 2),
            }
            for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(logdir, enabled=True):
    """jax.profiler trace context; silently no-ops if the backend does not
    support profiling (e.g. experimental tunneled platforms)."""
    if not enabled:
        yield False
        return
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield started
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def device_memory_stats():
    """Per-device memory stats dict (empty where unsupported)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
