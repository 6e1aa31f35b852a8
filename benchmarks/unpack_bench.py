"""Microbenchmark: INT4 weight-dequant strategies for the decode-shaped
matmul (M=16, K=14336, N=4096 — Llama-3-8B down_proj with batch 8 padded to
the sublane granule).

Decode is weight-streaming bound in theory (~5.6 ms/step for 3.5 GB of
packed int4 at v5e HBM bandwidth) but the shipped kernel measures ~29 ms:
the VPU nibble-unpack (9 int32-lane ops per weight byte) is ~6x slower than
the HBM stream it feeds.  Candidates measured here:

  pallas_unpack   — current kernel (int32 shifts/selects per nibble)
  pallas_combined — byte-value matmul + hi-nibble matmul; nibble planes
                    recovered algebraically in the epilogue (~4 ops/byte)
  xla_int4        — store jnp.int4, let XLA lower the convert+matmul
  xla_int8        — int8 weights (2x bytes, no unpack): bandwidth yardstick
  xla_bf16        — dense bf16 (4x bytes): the no-quantization yardstick

Timing: one jitted fori_loop re-running the op over L stacked weight slabs
(fresh HBM reads each iteration); two trip counts are differenced to cancel
dispatch overhead. Prints one JSON line per variant.
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

M, K, N = 16, 14336, 4096
L = 8          # stacked slabs (8 * 28 MB packed — far beyond VMEM)
N1, N2 = 64, 512   # iteration counts; the 448-iteration difference is the signal


def timed(fn, *args):
    import jax
    np.asarray(jax.block_until_ready(fn(*args, N1)))
    np.asarray(jax.block_until_ready(fn(*args, N2)))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(*args, N1)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(*args, N2)))
        t2 = time.perf_counter() - t0
        dt = (t2 - t1) / (N2 - N1)
        best = dt if best is None else min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from rsq_tpu.kernels import matmul_w4 as W

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (M, K)) * 0.1).astype(jnp.bfloat16)

    @jax.jit
    def gen(key):
        wq = jax.random.randint(key, (L, K, N), -8, 8, dtype=jnp.int8)
        scale = jnp.full((L, N), 1e-2, jnp.float32)
        return wq, scale

    wq, scale = gen(key)
    wp = jax.jit(jax.vmap(W.pack_w4_planar))(wq)

    def loop(step):
        @jax.jit
        def run(x, w, s, n):
            def body(i, acc):
                # serial: fold acc into x so iterations can't be reordered
                xx = x + jnp.sum(acc * 0.0).astype(x.dtype)
                return step(xx, w[i % L], s[i % L])[0, :8].astype(jnp.float32)
            out = jax.lax.fori_loop(0, n, body, jnp.zeros((8,), jnp.float32))
            return out
        return run

    bytes_packed = K * N // 2

    def report(name, fn, w, s, mult=1):
        try:
            dt = timed(fn, x, w, s)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:160]}),
                  flush=True)
            return
        print(json.dumps({
            "variant": name, "ms": round(dt * 1e3, 4),
            "GBps_effective": round(bytes_packed * mult / dt / 1e9, 1)}),
            flush=True)

    report("pallas_unpack",
           loop(lambda x, w, s: W.w4_matmul(x, w, s)), wp, scale)
    if hasattr(W, "w4_matmul_fast"):
        report("pallas_combined",
               loop(lambda x, w, s: W.w4_matmul_fast(x, w, s)), wp, scale)
    if hasattr(W, "w4a4_matmul_fast"):
        report("pallas_combined_a4",
               loop(lambda x, w, s: W.w4a4_matmul_fast(x, w, s)), wp, scale)

    w4 = jax.jit(lambda w: w.astype(jnp.int4))(wq)
    report("xla_int4",
           loop(lambda x, w, s: (x @ w.astype(jnp.bfloat16))
                * s[None, :].astype(jnp.bfloat16)), w4, scale)
    report("xla_int8",
           loop(lambda x, w, s: (x @ w.astype(jnp.bfloat16))
                * s[None, :].astype(jnp.bfloat16)), wq, scale, mult=2)
    wb = jax.jit(lambda w: w.astype(jnp.bfloat16) * 1e-2)(wq)
    report("xla_bf16", loop(lambda x, w, s: x @ w), wb, scale, mult=4)


if __name__ == "__main__":
    main()
