"""Per-stage wall-clock timing.

The reference only times whole runs (main_fusion.py:108,154-160, logged in
hours); this records per-stage durations so benchmarks and the profiler can
attribute time.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict


class StageTimer:
    def __init__(self) -> None:
        self.stages: "OrderedDict[str, float]" = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - start
            )

    def total(self) -> float:
        return sum(self.stages.values())

    def report(self) -> str:
        width = max((len(k) for k in self.stages), default=0)
        lines = [f"{k:<{width}} {v:9.3f}s" for k, v in self.stages.items()]
        lines.append(f"{'TOTAL':<{width}} {self.total():9.3f}s")
        return "\n".join(lines)
