"""Checkpoint/resume for long Monte-Carlo sweeps + per-stage timing.

The reference has no checkpointing (SURVEY.md §5: long notebook sweeps
restart from scratch); here the mutable sweep state is tiny and explicit —
the adaptive SNR scheduler plus accumulated counters — so a JSON file per
sweep suffices. Device-side state (channel fading, HARQ buffers) is
re-derived from keys, never checkpointed.

``StageTimer`` is the SURVEY §5 observability shim: wall-clock per named
stage with derived throughput, plus optional JAX profiler traces.
"""
from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager

import jax
import jax.numpy as jnp

from .snr import SnrScheduler


def run_checkpointed_sweep(point_fn, scheduler: SnrScheduler, keys,
                           checkpointPath: str, metricFn=None,
                           saveEvery: int = 1):
    """Adaptive sweep with resume: each completed SNR point is persisted.

    Args:
      point_fn: jitted (keys, snrDb) -> dict of summed int counters.
      scheduler: SnrScheduler (its state is saved/restored).
      keys: (N, 2) trial keys.
      checkpointPath: JSON file; if present, the sweep resumes from it.
      metricFn: counters -> (metric, *extras) passed to scheduler.setData;
        defaults to BLER% and BER%.
      saveEvery: checkpoint every N completed points.

    Returns scheduler.getSnrsAndData().
    """
    if metricFn is None:
        def metricFn(c):
            return (100.0 * c["blockErrors"] / max(c["blocks"], 1),
                    100.0 * c["bitErrors"] / max(c["bits"], 1))

    if os.path.exists(checkpointPath):
        with open(checkpointPath) as f:
            scheduler.load_state_dict(json.load(f)["scheduler"])
    done = 0
    for snrDb in scheduler:
        out = point_fn(keys, jnp.float32(snrDb))
        counters = {k: int(v) for k, v in out.items()}
        scheduler.setData(*metricFn(counters))
        done += 1
        if done % saveEvery == 0:
            tmp = checkpointPath + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"scheduler": scheduler.state_dict()}, f)
            os.replace(tmp, checkpointPath)
    if os.path.exists(checkpointPath):
        os.remove(checkpointPath)
    return scheduler.getSnrsAndData()


class StageTimer:
    """Named wall-clock stages with derived rates.

    with StageTimer() as t:
        with t.stage("decode", items=batch):
            jax.block_until_ready(decode(llrs))
    print(t.report())
    """

    def __init__(self):
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self.items: dict[str, int] = {}

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    @contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            self.items[name] = self.items.get(name, 0) + items

    def report(self) -> str:
        lines = []
        for name, t in sorted(self.times.items(), key=lambda kv: -kv[1]):
            line = f"{name:24s} {t*1e3:10.1f} ms  x{self.counts[name]}"
            if self.items[name]:
                line += f"  ({self.items[name]/t:10.1f}/s)"
            lines.append(line)
        return "\n".join(lines)


@contextmanager
def jax_trace(logdir: str):
    """JAX profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
