"""INT4 vs bf16 linear microbenchmark at Llama shapes, +- online Hadamard.

Counterpart of the reference's benchmarks/qlinear_benchmark.py:8-113 (int4
vs fp16 linear over llama-7/13/70B projection shapes). Prints a JSON line
per configuration.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

# (hidden, intermediate) per model family (qlinear_benchmark.py:8-22)
SHAPES = {
    "llama2-7b": (4096, 11008),
    "llama3-8b": (4096, 14336),
    "llama2-13b": (5120, 13824),
    "llama2-70b": (8192, 28672),
}


def main(models=("llama3-8b",), batch=128, with_had=True):
    import jax.numpy as jnp
    from rsq_tpu.kernels import matmul_w4 as MW
    from rsq_tpu.kernels.hadamard_mxu import hadamard_transform
    from rsq_tpu.utils.timing import chain_time

    rng = np.random.default_rng(0)
    for model in models:
        d, inter = SHAPES[model]
        for (k, n, name) in [(d, d, "attn_proj"), (d, inter, "up_proj"),
                             (inter, d, "down_proj")]:
            x = jnp.asarray(rng.standard_normal((batch, k)).astype(np.float32),
                            dtype=jnp.bfloat16)
            wq = jnp.asarray((np.frombuffer(rng.bytes(k * n), np.uint8)
                              .astype(np.int16) % 16 - 8).astype(np.int8)
                             .reshape(k, n))
            scale = jnp.asarray(
                (rng.uniform(0.5, 1.5, n) / (7 * np.sqrt(k))).astype(np.float32))
            packed = MW.pack_w4_planar(wq)
            wbf = (wq.astype(jnp.bfloat16) * scale[None, :].astype(jnp.bfloat16))

            def t_of(f):
                def step(s):
                    xx = x + s.astype(jnp.bfloat16)
                    # reduce over the FULL output: a [0,0] probe lets XLA
                    # slice straight through a dot and DCE the matmul
                    # (measured "-2 us" bf16 legs, r3)
                    return jnp.sum(f(xx), dtype=jnp.float32) * 1e-6
                return chain_time(step)

            t_bf = t_of(lambda xx: xx @ wbf)
            t_w4 = t_of(lambda xx: MW.w4_matmul(xx, packed, scale))
            t_w4a4 = t_of(lambda xx: MW.w4a4_matmul(xx, packed, scale))
            row = {"model": model, "proj": name, "batch": batch,
                   "k": k, "n": n,
                   "bf16_us": round(t_bf * 1e6, 1),
                   "w4_us": round(t_w4 * 1e6, 1),
                   "w4a4_us": round(t_w4a4 * 1e6, 1),
                   "w4_speedup": round(t_bf / t_w4, 2),
                   "w4a4_speedup": round(t_bf / t_w4a4, 2)}
            if with_had and name == "down_proj":
                t_had = t_of(lambda xx: MW.w4a4_matmul(
                    hadamard_transform(xx), packed, scale))
                row["w4a4_had_us"] = round(t_had * 1e6, 1)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main(models=tuple(sys.argv[1:]) or ("llama3-8b",))
