"""Per-frame / per-step metrics and profiling hooks.

The reference surfaces live stats in its InfoPanel (FPS, rendered/total
splat counts, last sort time — /root/reference/src/ui/InfoPanel.js,
Viewer.js:1804-1822) and ad-hoc performance.now() spans around the sort
(SortWorker.js:33-78).  The TPU build's equivalents:

- :class:`FrameStats` — one render/train step's numbers (wall ms,
  splats, pairs, overflow, Msplats/s).
- :class:`Timer` — blocking wall-clock span that waits for device work
  (the `sortTime` analogue; wrap any jitted call).
- :func:`profile_trace` — context manager around ``jax.profiler`` traces
  for per-kernel timelines viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

import jax


@dataclasses.dataclass
class FrameStats:
    wall_ms: float = 0.0
    num_splats: int = 0
    num_pairs: int = 0
    overflow: int = 0
    width: int = 0
    height: int = 0

    @property
    def msplats_per_s(self) -> float:
        if self.wall_ms <= 0:
            return 0.0
        return self.num_splats / self.wall_ms / 1e3

    def as_dict(self) -> dict:
        return {**dataclasses.asdict(self),
                "msplats_per_s": round(self.msplats_per_s, 3)}


class Timer:
    """Wall-clock span that blocks on device completion at exit.

    >>> with Timer() as t:
    ...     out = render(...)
    ...     t.block_on(out["color"])
    >>> t.ms
    """

    def __init__(self):
        self.ms = 0.0
        self._out = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def block_on(self, x):
        self._out = x
        return x

    def __exit__(self, *exc):
        if self._out is not None:
            jax.block_until_ready(self._out)
        self.ms = (time.perf_counter() - self._t0) * 1e3
        return False


@contextlib.contextmanager
def profile_trace(logdir: str, with_memory: bool = False):
    """Capture a jax.profiler trace (open with TensorBoard / XProf)."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=False,
                             create_perfetto_trace=with_memory)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_render(render_fn, *args, block_key: Optional[str] = "color",
                 **kwargs):
    """Run a render callable and return (output, FrameStats)."""
    with Timer() as t:
        out = render_fn(*args, **kwargs)
        t.block_on(out[block_key] if block_key else out)
    stats = FrameStats(wall_ms=t.ms)
    if isinstance(out, dict):
        if "num_pairs" in out:
            stats.num_pairs = int(out["num_pairs"])
        if "overflow" in out:
            stats.overflow = int(out["overflow"])
        col = out.get("color")
        if col is not None:
            stats.height, stats.width = col.shape[:2]
    return out, stats
