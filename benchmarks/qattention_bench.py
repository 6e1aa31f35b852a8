"""INT4 vs bf16 KV-cache decode attention microbenchmark.

Counterpart of benchmarks/qattention_benchmark.py:9-124 (paged KV decode
int4/f16 over (layers x heads x 128) shapes). One JSON line per config.

Measures BOTH kernel generations:
- stacked (the serving decode path: all kv heads per grid cell, layer
  selected by scalar prefetch from the full (L, ...) cache);
- unstacked (per-(B, H, chunk) grid; the TP-local attention path).
The bf16 twin is the XLA einsum attention the stacked bf16 kernel
replaces.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

# (num_kv_heads, head_dim, seq) configs
CONFIGS = [(8, 128, 2048), (8, 128, 8192), (32, 128, 2048)]


def main(batch=8, hq_mult=4, L=2):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rsq_tpu.kernels import kv_cache as KV
    from rsq_tpu.utils.timing import chain_time

    rng = np.random.default_rng(0)
    for hkv, d, S in CONFIGS:
        hq = hkv * hq_mult
        try:
            k = rng.standard_normal((batch, hkv, S, d)).astype(np.float32)
            v = rng.standard_normal((batch, hkv, S, d)).astype(np.float32)
            kq, kp = KV.to_lane_major(*KV.asym_quant_pack_head(jnp.asarray(k)))
            vq, vp = KV.to_lane_major(*KV.asym_quant_pack_head(jnp.asarray(v)))
            # stacked caches: L copies along a leading layer axis
            kqs, kps = jnp.stack([kq] * L), jnp.stack([kp] * L)
            vqs, vps = jnp.stack([vq] * L), jnp.stack([vp] * L)
            kbs = jnp.stack([jnp.asarray(k, jnp.bfloat16)] * L)
            vbs = jnp.stack([jnp.asarray(v, jnp.bfloat16)] * L)
            kb = kbs[0]
            vb = vbs[0]
            q0 = jnp.asarray(rng.standard_normal((batch, hq, d)),
                             dtype=jnp.bfloat16)
            lengths = jnp.full((batch,), S, jnp.int32)

            def t_int4_stacked(s):
                qq = q0 + s.astype(jnp.bfloat16)
                o, m, l = KV.int4_decode_attention_stacked(
                    qq, kqs, kps, vqs, vps, 1, lengths)
                return jnp.sum(o, dtype=jnp.float32) * 1e-6

            def t_bf16_stacked(s):
                qq = q0 + s.astype(jnp.bfloat16)
                o, m, l = KV.bf16_decode_attention_stacked(
                    qq, kbs, vbs, 1, lengths)
                return jnp.sum(o, dtype=jnp.float32) * 1e-6

            def t_int4(s):
                qq = q0 + s.astype(jnp.bfloat16)
                o = KV.int4_decode_attention(qq, kq, kp, vq, vp, lengths)
                return jnp.sum(o, dtype=jnp.float32) * 1e-6

            def t_bf16(s):
                # bf16 operands, f32 accumulation (an f32 cast of the cache
                # materializes a full-size f32 temp: 8.6 GB at seq 8192)
                qq = q0 + s.astype(jnp.bfloat16)
                qg = qq.reshape(batch, hkv, hq_mult, d)
                logits = jnp.einsum("bhgd,bhsd->bhgs", qg, kb,
                                    preferred_element_type=jnp.float32)
                p = jax.nn.softmax(logits / np.sqrt(d), axis=-1)
                o = jnp.einsum("bhgs,bhsd->bhgd", p.astype(jnp.bfloat16), vb,
                               preferred_element_type=jnp.float32)
                return jnp.sum(o, dtype=jnp.float32) * 1e-6

            row = {"hkv": hkv, "hq": hq, "head_dim": d, "seq": S,
                   "batch": batch}
            cache_bytes_i4 = kq.size + vq.size + (kp.size + vp.size) * 4
            cache_bytes_bf = kb.size * 2 + vb.size * 2
            for name, fn, nbytes in (
                    ("int4_stacked", t_int4_stacked, cache_bytes_i4),
                    ("bf16_stacked", t_bf16_stacked, cache_bytes_bf),
                    ("int4", t_int4, cache_bytes_i4),
                    ("bf16_xla", t_bf16, cache_bytes_bf)):
                try:
                    t = chain_time(fn)
                    row[f"{name}_us"] = round(t * 1e6, 1)
                    row[f"{name}_GBps"] = round(nbytes / t / 1e9, 1)
                except Exception as e:  # noqa: BLE001
                    row[f"{name}_error"] = repr(e)[:120]
            if "int4_stacked_us" in row and "bf16_stacked_us" in row:
                row["stacked_speedup"] = round(
                    row["bf16_stacked_us"] / row["int4_stacked_us"], 2)
            row["mem_ratio"] = round(cache_bytes_bf / cache_bytes_i4, 2)
            print(json.dumps(row), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"hkv": hkv, "seq": S,
                              "error": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
