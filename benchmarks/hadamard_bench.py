"""Fast Hadamard transform benchmark + correctness check.

Counterpart of benchmarks/hadamard_benchmark.py:4-24 (FWHT fp16 vs fp32,
n = 1024..12288, with an allclose check). One JSON line per size.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

SIZES = [1024, 2048, 4096, 5120, 8192, 11008, 12288, 14336]


def main(rows=4096):
    import jax.numpy as jnp
    from rsq_tpu.core.hadamard import matmul_hadU
    from rsq_tpu.kernels.hadamard_mxu import hadamard_transform
    from rsq_tpu.utils.timing import chain_time

    rng = np.random.default_rng(0)
    for n in SIZES:
        x32 = jnp.asarray(rng.standard_normal((rows, n)).astype(np.float32))
        xbf = x32.astype(jnp.bfloat16)

        # correctness: bf16 vs f32 paths agree (the reference's allclose)
        y32 = hadamard_transform(x32[:64])
        ybf = hadamard_transform(xbf[:64]).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(y32 - ybf)))
        ok = err < 0.1 * float(jnp.max(jnp.abs(y32)))

        def t_of(x):
            def step(s):
                # full-output reduction — a [0,0] probe would let XLA slice
                # through the transform's matmuls and DCE them
                y = hadamard_transform(x + s.astype(x.dtype))
                return jnp.sum(y, dtype=jnp.float32) * 1e-6
            return chain_time(step)

        t32 = t_of(x32)
        tbf = t_of(xbf)
        bw = rows * n * 2 * 4 / t32  # read+write f32
        print(json.dumps({
            "n": n, "rows": rows, "f32_us": round(t32 * 1e6, 1),
            "bf16_us": round(tbf * 1e6, 1),
            "f32_GBps": round(bw / 1e9, 1),
            "bf16_vs_f32_max_err": round(err, 5), "allclose": ok,
        }), flush=True)


if __name__ == "__main__":
    main()
