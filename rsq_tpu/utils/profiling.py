"""Profiling helpers (jax.profiler integration).

The reference's only instrumentation is wall-clock prints
(e2e/benchmark.py:36-55); here traces can be captured for any step and
inspected with TensorBoard/XProf, plus a simple roofline estimator for
kernel sanity checks.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger(__name__)

# v5e per-chip peaks (public spec)
V5E_BF16_TFLOPS = 197.0
V5E_INT8_TOPS = 394.0
V5E_HBM_GBPS = 819.0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("trace written to %s", log_dir)


@contextlib.contextmanager
def timed(label: str):
    t0 = time.perf_counter()
    yield
    logger.info("%s: %.3fs", label, time.perf_counter() - t0)


def roofline_seconds(flops: float = 0.0, hbm_bytes: float = 0.0,
                     bf16: bool = True) -> float:
    """Lower bound for a kernel on v5e: max(compute, bandwidth) time."""
    peak = (V5E_BF16_TFLOPS if bf16 else V5E_INT8_TOPS) * 1e12
    t_compute = flops / peak
    t_mem = hbm_bytes / (V5E_HBM_GBPS * 1e9)
    return max(t_compute, t_mem)


def efficiency(measured_s: float, flops: float = 0.0,
               hbm_bytes: float = 0.0, bf16: bool = True) -> float:
    """Fraction of speed-of-light achieved."""
    return roofline_seconds(flops, hbm_bytes, bf16) / max(measured_s, 1e-12)
