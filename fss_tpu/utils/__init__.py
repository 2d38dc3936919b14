"""Utilities: profiling/observability helpers (SURVEY §5 parity — the
reference's tooling-level flamegraph/nsys/ptxas targets map to
jax.profiler traces and items/s counters here)."""

from fss_tpu.utils.profiling import profile_trace, throughput

__all__ = ["profile_trace", "throughput"]
