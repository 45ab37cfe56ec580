"""Performance metric store + FLOPS accounting.

Re-designs the reference's global metric store (src/performance_calculate.c:11
``MetricStats metrics[NUM_METRICS]``) as an instantiable :class:`MetricStore`
keyed by arbitrary stage names (the reference enums
performance_calculate.h:23-31 / .cuh:19-29 become plain strings), and
implements the std-dev/variance API the reference declared but never defined
(performance_calculate.h:59-60 — dead symbols there, live here).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .validation import DiffMetrics

__all__ = ["MetricStat", "MetricStore", "calculate_flops", "format_flops", "format_bytes"]


@dataclass
class MetricStat:
    """Accumulator for one stage (≙ reference MetricStats,
    performance_calculate.h:33-44)."""

    values: list = field(default_factory=list)
    sum: float = 0.0
    relative_error: float = 0.0
    absolute_error: float = 0.0
    error_samples: int = 0

    @property
    def count(self) -> int:
        return len(self.values)

    def update(self, value: float):
        """≙ update_medium_metric (performance_calculate.c:70-86)."""
        self.values.append(float(value))
        self.sum += float(value)

    def accumulate_errors(self, diff: DiffMetrics):
        """≙ accumulateErrors (performance_calculate.c:53-56)."""
        self.absolute_error += diff.mean_abs_err
        self.relative_error += diff.mean_rel_err
        self.error_samples += 1

    @property
    def mean(self) -> float:
        """≙ get_metric_value (performance_calculate.c:36-39)."""
        return self.sum / self.count if self.count else 0.0

    @property
    def variance(self) -> float:
        """Population variance (the API performance_calculate.h:60 declares
        but never defines)."""
        n = self.count
        if n == 0:
            return 0.0
        mu = self.mean
        return sum((v - mu) ** 2 for v in self.values) / n

    @property
    def stddev(self) -> float:
        return math.sqrt(self.variance)

    @property
    def min(self) -> float:
        return min(self.values) if self.values else 0.0

    @property
    def max(self) -> float:
        return max(self.values) if self.values else 0.0

    def average_errors(self, extra_skip: int = 0) -> DiffMetrics:
        """≙ computeAverageErrors (performance_calculate.c:58-67).

        The reference divides by ``count + ITERATION_SKIP`` even though errors
        were accumulated over all iterations — we divide by the actual number
        of accumulated samples plus ``extra_skip`` for bit-compatible output
        when requested.
        """
        n = self.error_samples + extra_skip
        if n == 0:
            return DiffMetrics()
        return DiffMetrics(
            mean_abs_err=self.absolute_error / n,
            mean_rel_err=self.relative_error / n,
        )


class MetricStore:
    """Named-stage metric registry (≙ the metrics[] global + enum)."""

    def __init__(self):
        self._stats: dict = {}

    def __getitem__(self, stage: str) -> MetricStat:
        return self._stats.setdefault(stage, MetricStat())

    def __contains__(self, stage: str) -> bool:
        return stage in self._stats

    def stages(self):
        return list(self._stats)

    def reset(self):
        """≙ reset_medium_time_metrics (performance_calculate.c:88-95)."""
        self._stats.clear()

    def mean(self, stage: str) -> float:
        return self[stage].mean


def calculate_flops(nnz: int, seconds: float) -> float:
    """``2 * nnz / t`` (≙ calculate_flops, performance_calculate.c:98-101)."""
    if seconds <= 0:
        return 0.0
    return 2.0 * nnz / seconds


def format_flops(flops: float) -> str:
    """Human formatting KFLOPS→EFLOPS (≙ print_flops,
    performance_calculate.c:104-114)."""
    units = ["FLOPS", "KFLOPS", "MFLOPS", "GFLOPS", "TFLOPS", "PFLOPS", "EFLOPS"]
    i = 0
    while flops >= 1000.0 and i < len(units) - 1:
        flops /= 1000.0
        i += 1
    return f"{flops:.3f} {units[i]}"


def format_bytes(n: float) -> str:
    units = ["B", "KiB", "MiB", "GiB", "TiB"]
    i = 0
    while n >= 1024.0 and i < len(units) - 1:
        n /= 1024.0
        i += 1
    return f"{n:.2f} {units[i]}"
