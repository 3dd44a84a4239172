"""Named wall-clock timers (ref lib/utils/timer.py:12-49).

The reference synchronizes CUDA before stamping; the JAX equivalent blocks
on outstanding device work via `jax.block_until_ready` when a value is
passed to toc()."""

from __future__ import annotations

import time
from typing import Any, Dict, Optional


class Timer:
    def __init__(self):
        self._totals: Dict[str, float] = {}
        self._calls: Dict[str, int] = {}
        self._starts: Dict[str, float] = {}

    def tic(self, name: str = "default"):
        self._starts[name] = time.perf_counter()

    def toc(self, name: str = "default", sync: Optional[Any] = None) -> float:
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        dt = time.perf_counter() - self._starts[name]
        self._totals[name] = self._totals.get(name, 0.0) + dt
        self._calls[name] = self._calls.get(name, 0) + 1
        return dt

    def average_time(self, name: str = "default") -> float:
        return self._totals.get(name, 0.0) / max(self._calls.get(name, 0), 1)

    def total_time(self, name: str = "default") -> float:
        return self._totals.get(name, 0.0)

    def summary(self) -> str:
        return ", ".join(
            f"{k}: {self.average_time(k) * 1000:.1f}ms/call x{self._calls[k]}"
            for k in sorted(self._totals)
        )
