"""Robust on-device timing.

The TPU runtime in this environment is reached through a tunnel where
`block_until_ready` can return before execution finishes and per-dispatch
latency is large and noisy.  `chain_time` therefore measures a SERIAL chain
of n applications inside one jit (data dependence prevents hoisting),
forces completion with a scalar host readback, and differences two chain
lengths to cancel the fixed dispatch + transfer overhead.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(fn, n1: int = 64, n2: int = 448, repeats: int = 3) -> float:
    """Seconds per application of `fn`.

    fn: seed_scalar -> scalar (must depend on its argument so the chain is
    serial; fold your computation's output into the returned scalar).

    Chain lengths must make the leg DIFFERENCE large against the tunnel's
    per-dispatch jitter (~1 ms): the old 8/40 defaults produced NEGATIVE
    times for ~100 us ops (r3 qlinear run); 64/448 gives >=10 ms
    differences for anything over 30 us."""
    def make(n):
        @jax.jit
        def run(seed):
            return jax.lax.fori_loop(0, n, lambda i, s: fn(s), seed)
        return run

    f1, f2 = make(n1), make(n2)
    s0 = jnp.float32(0.0)
    float(f1(s0))
    float(f2(s0))
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f1(s0))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f2(s0))
        t2 = time.perf_counter() - t0
        dt = (t2 - t1) / (n2 - n1)
        best = dt if best is None else min(best, dt)
    return best


def matmul_seconds(x, w) -> float:
    """Time y = x @ w with a serial perturbation chain.  The chain scalar
    reduces over the FULL output — a [0,0] probe lets XLA slice through
    the dot and DCE the matmul (measured as negative legs, r3)."""
    def step(s):
        xx = x + s.astype(x.dtype)
        return jnp.sum(xx @ w, dtype=jnp.float32) * 1e-6
    return chain_time(step)
