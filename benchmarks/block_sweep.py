"""Block-shape sweep for the W4A4 kernel on the decode-shaped down_proj
matmul (M=16, K=14336, N=4096), with two yardstick kernels that isolate the
bottleneck:

  dma_stream : DMA the packed bytes through VMEM, one 8x128 reduce per block
               (no unpack, no MXU) -> pure HBM->VMEM streaming rate
  unpack_sum : DMA + int32 nibble unpack + reduce (no MXU) -> VPU unpack rate

If unpack_sum << dma_stream, the kernel is VPU-bound on nibble extraction
and block-shape tuning alone cannot reach the HBM roofline.

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

    def leg(n):
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(fn(*args, n)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    np.asarray(jax.block_until_ready(fn(*args, N1)))
    np.asarray(jax.block_until_ready(fn(*args, N2)))
    return (leg(N2) - leg(N1)) / (N2 - N1)


def make_stream(bk, bn, unpack: bool):
    import jax
    from jax.experimental import pallas as pl

    def kernel(w_ref, out_ref):
        if unpack:
            from rsq_tpu.kernels.matmul_w4 import _unpack_block_bf16
            lo, hi = _unpack_block_bf16(w_ref[...])
            out_ref[...] = (lo[:8, :128] + hi[:8, :128]).astype(jnp.float32)
        else:
            out_ref[...] = w_ref[0:8, 0:128].astype(jnp.float32)

    @jax.jit
    def run(w):
        Kp, Nh = w.shape
        grid = (Nh // bn, Kp // bk)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((bk, bn), lambda j, k: (k, j))],
            out_specs=pl.BlockSpec((8, 128), lambda j, k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(w)
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

    wp = jax.jit(lambda k: jax.random.bits(
        k, (L, K, N // 2), dtype=jnp.uint8))(key)
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

    def report(name, dt):
        print(json.dumps({
            "variant": name, "ms": round(dt * 1e3, 4),
            "GBps_effective": round(bytes_packed / dt / 1e9, 1)}),
            flush=True)

    # yardsticks: pure DMA vs DMA+unpack
    for unpack in (False, True):
        for bk, bn in [(512, 1024), (1024, 1024), (2048, 1024), (2048, 2048)]:
            tag = "unpack_sum" if unpack else "dma_stream"
            stream = make_stream(bk, bn, unpack)

            @jax.jit
            def sloop(w, n, stream=stream):
                def body(i, acc):
                    return acc + stream(w[i % L])[0, 0]
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            try:
                dt = timed(lambda w, n: sloop(w, n), wp)
                report(f"{tag}_{bk}x{bn}", dt)
            except Exception as e:
                print(json.dumps({"variant": f"{tag}_{bk}x{bn}",
                                  "error": repr(e)[:150]}), flush=True)

    # kernel block sweep (bn in packed-column units; Nh = N/2 = 2048 here)
    for i8 in (False, True):
        for bn, bk in [(256, 512), (512, 1024), (1024, 1024), (1024, 2048),
                       (2048, 1024), (2048, 1792)]:
            tag = "i8" if i8 else "bf16"
            try:
                dt = timed(loop(
                    lambda x, w, s, bn=bn, bk=bk, i8=i8: W.w4a4_matmul(
                        x, w, s, block_n=bn, block_k=bk, mxu_int8=i8)),
                    x, wp, scale)
                report(f"w4a4_{tag}_n{bn}_k{bk}", dt)
            except Exception as e:
                print(json.dumps({"variant": f"w4a4_{tag}_n{bn}_k{bk}",
                                  "error": repr(e)[:150]}), flush=True)


if __name__ == "__main__":
    main()
