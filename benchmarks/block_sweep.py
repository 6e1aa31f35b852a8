"""Block-shape sweep for the combined-byte W4A4 kernel on the decode-shaped
down_proj matmul (M=16, K=14336, N=4096), plus a pure-DMA yardstick kernel
(streams the same packed bytes through VMEM, one add per block, no MXU) to
separate DMA efficiency from compute.

Long iteration counts (256 vs 2048) push the differencing signal well above
the tunnel's dispatch jitter.
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

M, K, N = 16, 14336, 4096
L = 8
N1, N2 = 256, 2048


def timed(fn, *args, repeats=3):
    import jax
    np.asarray(jax.block_until_ready(fn(*args, N1)))
    np.asarray(jax.block_until_ready(fn(*args, N2)))
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(*args, N1)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(*args, N2)))
        t2 = time.perf_counter() - t0
        dt = (t2 - t1) / (N2 - N1)
        best = dt if best is None else min(best, dt)
    return best


def stream_sum_kernel(w_ref, out_ref):
    # BlockSpec forces the full-block DMA into VMEM; the kernel touches only
    # a corner so the measurement is DMA-dominated
    out_ref[0, 0] = jnp.sum(w_ref[0:8, 0:128].astype(jnp.int32))


def make_stream(bk, bn):
    import jax
    from jax.experimental import pallas as pl

    @jax.jit
    def run(w):
        Kp, Nh = w.shape
        grid = (Nh // bn, Kp // bk)
        outs = pl.pallas_call(
            stream_sum_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((bk, bn), lambda j, k: (k, j))],
            out_specs=pl.BlockSpec((1, 1), lambda j, k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(w)
        return outs
    return run


def main():
    global jnp
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
        return wq

    wq = gen(key)
    wp = jax.jit(jax.vmap(W.pack_w4_planar))(wq)
    scale = jnp.full((L, N), 1e-2, jnp.float32)
    bytes_packed = K * N // 2

    def loop(step):
        @jax.jit
        def run(x, w, s, n):
            def body(i, acc):
                xx = x + jnp.sum(acc * 0.0).astype(x.dtype)
                return step(xx, w[i % L], s[i % L])[0, :8].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((8,), jnp.float32))
        return run

    def report(name, dt, mult=1):
        print(json.dumps({
            "variant": name, "ms": round(dt * 1e3, 4),
            "GBps_effective": round(bytes_packed * mult / dt / 1e9, 1)}),
            flush=True)

    # pure DMA stream yardstick at two block shapes
    for bk, bn in [(512, 256), (1024, 512), (2048, 1024)]:
        stream = make_stream(bk, bn)

        @jax.jit
        def sloop(w, n, stream=stream):
            def body(i, acc):
                return acc + stream(w[i % L])[0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        try:
            dt = timed(lambda w, n: sloop(w, n), wp)
            report(f"dma_stream_{bk}x{bn}", dt)
        except Exception as e:
            print(json.dumps({"variant": f"dma_stream_{bk}x{bn}",
                              "error": repr(e)[:150]}), flush=True)

    # kernel block sweep
    for bn, bk in [(256, 512), (512, 512), (512, 1024), (1024, 512),
                   (1024, 1024), (2048, 896)]:
        try:
            dt = timed(loop(lambda x, w, s, bn=bn, bk=bk: W.w4a4_matmul_fast(
                x, w, s, block_n=bn, block_k=bk)), x, wp, scale)
            report(f"w4a4_fast_n{bn}_k{bk}", dt)
        except Exception as e:
            print(json.dumps({"variant": f"w4a4_fast_n{bn}_k{bk}",
                              "error": repr(e)[:150]}), flush=True)


if __name__ == "__main__":
    main()
