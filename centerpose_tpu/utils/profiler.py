"""Profiling utilities.

The reference's tracing story is manual wall-clock segmentation with cuda
synchronize fences (base_detector.py:390-772, SURVEY §5). Here:
  * `StageTimer` — same per-stage wall-clock surface (stage names tot/load/pre/net/
    dec/post/merge/pnp/track) with forced device sync via jax.block_until_ready;
  * `trace` — context manager around jax.profiler for XLA-level traces viewable in
    TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StageTimer:
    def __init__(self):
        self.times: Dict[str, float] = {}
        self._t = time.perf_counter()

    def stage(self, name: str, sync=None):
        """Record elapsed time since the previous stage mark; optionally wait on a
        device value first (the cuda-synchronize-fence equivalent)."""
        if sync is not None:
            jax.block_until_ready(sync)
        now = time.perf_counter()
        self.times[name] = self.times.get(name, 0.0) + (now - self._t)
        self._t = now

    def total(self) -> float:
        return sum(self.times.values())

    def format(self) -> str:
        return "|".join(f"{k} {v:.3f}s" for k, v in self.times.items())


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/centerpose_trace"):
    """XLA profiler trace (open with TensorBoard's profile plugin / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
