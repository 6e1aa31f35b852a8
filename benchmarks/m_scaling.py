"""Does the combined-byte W4A4 kernel amortize MXU weight-tile loads?

Times the down_proj-shaped matmul (K=14336, N=4096) at M = 16..512.
If the kernel is weight-tile-load bound, ms/slab is flat in M and
tokens/sec scales linearly with batch — which sets the serving batch policy.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

K, N = 14336, 4096
L = 8


def main():
    import jax
    import jax.numpy as jnp
    from rsq_tpu.kernels import matmul_w4 as W

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    key = jax.random.PRNGKey(0)
    wq = jax.jit(lambda k: jax.random.randint(
        k, (L, K, N), -8, 8, dtype=jnp.int8))(key)
    wp = jax.jit(jax.vmap(W.pack_w4_planar))(wq)
    scale = jnp.full((L, N), 1e-2, jnp.float32)

    for M in (16, 64, 128, 256, 512):
        x = (jax.random.normal(key, (M, K)) * 0.1).astype(jnp.bfloat16)
        n1, n2 = 128, 768

        @jax.jit
        def run(x, w, s, n):
            def body(i, acc):
                xx = x + jnp.sum(acc * 0.0).astype(x.dtype)
                y = W.w4a4_matmul_fast(xx, w[i % L], s[i % L],
                                       block_n=1024, block_k=1024)
                return y[0, :8].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((8,), jnp.float32))

        np.asarray(run(x, wp, scale, n1))
        np.asarray(run(x, wp, scale, n2))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(x, wp, scale, n1))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(run(x, wp, scale, n2))
            t2 = time.perf_counter() - t0
            dt = (t2 - t1) / (n2 - n1)
            best = dt if best is None else min(best, dt)
        print(json.dumps({"M": M, "ms": round(best * 1e3, 4),
                          "us_per_row": round(best * 1e6 / M, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
