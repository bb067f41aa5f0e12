"""Structured metrics, logging and profiling.

The reference has no observability beyond verbose prints
(``utils/train_model.py:78-85``) and raw ``time.time()`` deltas in stale
benchmark scripts (SURVEY §5). Here: a structured per-epoch metrics recorder
(JSONL sink), host-0-only logging for multi-process runs, and a
``jax.profiler`` trace context for TPU performance work.
"""

from __future__ import annotations

import contextlib
import json
import pathlib
import time
from typing import Optional

import jax


def is_host_zero() -> bool:
    return jax.process_index() == 0


class MetricsRecorder:
    """Append-only JSONL metrics sink (host 0 only)."""

    def __init__(self, path: Optional[str] = None, verbose: bool = False):
        self.path = pathlib.Path(path) if path else None
        self.verbose = verbose
        self.history: list[dict] = []
        if self.path and is_host_zero():
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def record(self, step: int, **metrics):
        row = {"step": step, "time": time.time(), **metrics}
        self.history.append(row)
        if not is_host_zero():
            return
        if self.path:
            with open(self.path, "a") as fh:
                fh.write(json.dumps(row) + "\n")
        if self.verbose:
            parts = [f"step={step}"] + [
                f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in metrics.items()
            ]
            print("[metrics] " + " ".join(parts))


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace scope (view with TensorBoard / xprof)."""
    if not enabled or not is_host_zero():
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def phase_timer(name: str, sink: Optional[dict] = None, verbose: bool = False):
    """Wall-clock phase timing (graph build / eigh / CG / eval ...)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink[name] = sink.get(name, 0.0) + dt
        if verbose and is_host_zero():
            print(f"[timer] {name}: {dt:.3f}s")
