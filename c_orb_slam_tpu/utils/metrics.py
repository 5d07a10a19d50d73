"""Structured per-frame metrics and stage timing.

The reference's observability is cout prints plus per-frame wall times
computed in the example mains (reference: Examples/Stereo/stereo_kitti.cc:
80-122 chrono timing + median/mean report; event prints like "Loop
detected!" LoopClosing.cc:404). Here observability is first-class
(SURVEY.md §5): every tracked frame appends one structured record, stage
timers aggregate per-stage wall time, and the whole log exports to JSONL
for offline analysis. Device-side tracing hooks into jax.profiler.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


@dataclass
class FrameRecord:
    frame_id: int
    timestamp: float
    state: int
    n_inliers: int
    n_keyframes: int
    n_points: int
    is_keyframe: bool
    total_ms: float
    stages_ms: dict

    def to_json(self) -> str:
        return json.dumps(self.__dict__)


@dataclass
class Metrics:
    records: list = field(default_factory=list)
    stage_totals: dict = field(default_factory=dict)
    counters: dict = field(default_factory=dict)
    _open_stages: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, trace: bool = False):
        """Time a pipeline stage; optionally emit a jax.profiler
        annotation so device traces line up with host stages."""
        t0 = time.perf_counter()
        ctx = contextlib.nullcontext()
        if trace:
            import jax

            ctx = jax.profiler.TraceAnnotation(name)
        with ctx:
            yield
        dt = (time.perf_counter() - t0) * 1000.0
        self._open_stages[name] = self._open_stages.get(name, 0.0) + dt
        tot = self.stage_totals.setdefault(name, [0.0, 0])
        tot[0] += dt
        tot[1] += 1

    def reset(self):
        self.records = []
        self.stage_totals = {}
        self.counters = {}
        self._open_stages = {}

    def count(self, name: str, n: int = 1):
        self.counters[name] = self.counters.get(name, 0) + n

    def end_frame(self, frame_id, timestamp, state, n_inliers,
                  n_keyframes, n_points, is_keyframe, total_ms):
        self.records.append(
            FrameRecord(
                frame_id=int(frame_id),
                timestamp=float(timestamp),
                state=int(state),
                n_inliers=int(n_inliers),
                n_keyframes=int(n_keyframes),
                n_points=int(n_points),
                is_keyframe=bool(is_keyframe),
                total_ms=float(total_ms),
                stages_ms={k: round(v, 3) for k, v in self._open_stages.items()},
            )
        )
        self._open_stages = {}

    # -- reporting ---------------------------------------------------------
    def summary(self) -> dict:
        """Median/mean per-frame time + per-stage totals (the reference
        prints median/mean tracking time at exit, stereo_kitti.cc:121)."""
        import numpy as np

        times = np.asarray([r.total_ms for r in self.records], np.float64)
        out = {
            "frames": len(self.records),
            "median_ms": float(np.median(times)) if len(times) else 0.0,
            "mean_ms": float(times.mean()) if len(times) else 0.0,
            "fps": 1000.0 / float(times.mean()) if len(times) else 0.0,
            "stages": {
                k: {"total_ms": round(v[0], 1), "calls": v[1]}
                for k, v in sorted(self.stage_totals.items())
            },
            "counters": dict(self.counters),
        }
        return out

    def save_jsonl(self, path: str):
        with open(path, "w") as f:
            for r in self.records:
                f.write(r.to_json() + "\n")
