"""Tracing / profiling helpers (the aux subsystem the reference lacks,
SURVEY §5.1): jax.profiler trace capture, per-step host timing, XLA dumps.
"""
from __future__ import annotations

import contextlib
import json
import math
import os
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace") -> Iterator[None]:
    """Capture a jax.profiler trace (open with XProf / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labeling regions inside a trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step wall-clock stats for the training loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t0: Optional[float] = None
        self._times = []

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    def rate(self, batch_size: int) -> float:
        return batch_size / self.mean if self._times else 0.0


def enable_xla_dump(dump_dir: str = "/tmp/xla_dump"):
    """Set XLA dump flags (must run before the first compilation)."""
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_dump_to={dump_dir}").strip()


class MetricLogger:
    """JSON-lines metric logging with optional wandb mirroring.

    The reference logs to wandb + .npy dumps (pretrain.py:283-318,
    infer.py:821-865); here stdout JSON lines are the source of truth and
    wandb attaches when available + requested.
    """

    def __init__(self, use_wandb: bool = False, project: str = "",
                 run_name: str = "", config: Optional[Dict] = None,
                 out_file: Optional[str] = None):
        self._wandb = None
        self._file = open(out_file, "a") if out_file else None
        if use_wandb:
            try:
                import wandb
                wandb.init(project=project or "ood-detection-tpu",
                           name=run_name or None, config=config or {})
                self._wandb = wandb
            except ImportError:
                pass

    def log(self, metrics: Dict, step: Optional[int] = None):
        payload = dict(metrics)
        if step is not None:
            payload["step"] = step
        def clean(v):
            if hasattr(v, "item"):
                v = float(v)
            if isinstance(v, float) and not math.isfinite(v):
                return None      # json.dumps would emit bare Infinity/NaN
            return v
        line = json.dumps({k: clean(v) for k, v in payload.items()})
        print(line)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self._file:
            self._file.close()
        if self._wandb:
            self._wandb.finish()
