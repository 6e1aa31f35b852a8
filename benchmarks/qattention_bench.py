"""INT4 vs bf16 KV-cache decode attention microbenchmark.

Counterpart of benchmarks/qattention_benchmark.py:9-124 (paged KV decode
int4/f16 over (layers x heads x 128) shapes). One JSON line per config.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

# (num_kv_heads, head_dim) configs; seq lengths swept
CONFIGS = [(8, 128), (32, 128)]


def main(batch=8, hq_mult=4, seqs=(2048, 8192)):
    import jax.numpy as jnp
    from rsq_tpu.kernels import kv_cache as KV
    from rsq_tpu.utils.timing import chain_time

    rng = np.random.default_rng(0)
    for hkv, d in CONFIGS:
        hq = hkv * hq_mult
        for S in seqs:
            k = rng.standard_normal((batch, hkv, S, d)).astype(np.float32)
            v = rng.standard_normal((batch, hkv, S, d)).astype(np.float32)
            kq, kp = KV.to_lane_major(*KV.asym_quant_pack_head(jnp.asarray(k)))
            vq, vp = KV.to_lane_major(*KV.asym_quant_pack_head(jnp.asarray(v)))
            kb = jnp.asarray(k, jnp.bfloat16)
            vb = jnp.asarray(v, jnp.bfloat16)
            q0 = jnp.asarray(rng.standard_normal((batch, hq, d)),
                             dtype=jnp.bfloat16)
            lengths = jnp.full((batch,), S, jnp.int32)

            def t_int4(s):
                qq = q0 + s.astype(jnp.bfloat16)
                o = KV.int4_decode_attention(qq, kq, kp, vq, vp, lengths)
                return o[0, 0, 0].astype(jnp.float32)

            def t_bf16(s):
                qq = (q0 + s.astype(jnp.bfloat16)).astype(jnp.float32)
                qg = qq.reshape(batch, hkv, hq_mult, d)
                logits = jnp.einsum("bhgd,bhsd->bhgs", qg,
                                    kb.astype(jnp.float32))
                p = jax.nn.softmax(logits / np.sqrt(d), axis=-1)
                o = jnp.einsum("bhgs,bhsd->bhgd", p, vb.astype(jnp.float32))
                return o[0, 0, 0, 0]

            import jax
            ti = chain_time(t_int4)
            tb = chain_time(t_bf16)
            cache_bytes_i4 = kq.size + vq.size + (kp.size + vp.size) * 4
            cache_bytes_bf = kb.size * 2 + vb.size * 2
            print(json.dumps({
                "hkv": hkv, "hq": hq, "head_dim": d, "seq": S, "batch": batch,
                "int4_us": round(ti * 1e6, 1),
                "bf16_us": round(tb * 1e6, 1),
                "int4_GBps": round(cache_bytes_i4 / ti / 1e9, 1),
                "bf16_GBps": round(cache_bytes_bf / tb / 1e9, 1),
                "speedup": round(tb / ti, 2),
                "mem_ratio": round(cache_bytes_bf / cache_bytes_i4, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
