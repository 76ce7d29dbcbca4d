"""Host-side utilities: logging, profiling, throughput counters."""

from nerf_simple_tpu.utils.profiling import Throughput, trace_context

__all__ = ["Throughput", "trace_context"]
