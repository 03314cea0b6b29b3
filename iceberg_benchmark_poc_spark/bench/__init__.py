"""Benchmark suites mirroring the reference's 11 workloads (SURVEY.md §0).

Each suite reproduces the reference's *measurable shape* — counts, ratios,
reduction factors, and real wall-clock where the work is real (reference
metrics built on time.sleep simulation are reproduced as counts + cost-model
ratios, per BASELINE.md's ⚠ markers).
"""

from .suites import run_all_suites

__all__ = ["run_all_suites"]
