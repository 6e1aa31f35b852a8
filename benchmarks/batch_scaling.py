"""Decode throughput vs batch size: the serving-relevant scaling curve.

Decode at small batch is weight-read bound (the same ~3.5 GB of INT4
weights are streamed per step regardless of batch), so tokens/sec/chip
should scale near-linearly in batch until the per-token work (KV reads,
activations) catches up.  Counterpart of the reference's bsz sweep in
e2e/benchmark.py:89-183.

Prints one JSON line per batch size.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import build_int4_params, measure_decode  # noqa: E402


def main(batches=(8, 16, 32, 64), max_seq=1024):
    import os
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rsq_tpu.models.config import ModelConfig
    from rsq_tpu.serving import model as S

    cfg = ModelConfig.llama3_8b()
    params = build_int4_params(cfg)
    # match the headline configuration (bench.py defaults): int8 lm_head
    # and the int8-MXU attention QK path, both env-disable-able.  The
    # attention share of the step grows with batch, so int8_qk matters
    # MORE here than at batch 8.
    if os.environ.get("RSQ_INT8_LMHEAD", "1") != "0":
        params = S.quantize_lm_head(params)
    attn_i8 = os.environ.get("RSQ_ATTN_INT8_QK", "1") != "0"
    for b in batches:
        try:
            # the cache is jit-local in measure_decode (no second
            # argument copy), so every batch runs at full max_seq
            sc = S.ServingConfig(model=cfg, a4=True, kv_int4=True,
                                 kv_hadamard=True, online_had=True,
                                 max_seq=max_seq, attn_int8_qk=attn_i8)
            dt = measure_decode(params, sc, b)
            print(json.dumps({
                "batch": b, "max_seq": max_seq,
                "int8_lmhead": "lm_head_q" in params,
                "attn_int8_qk": attn_i8,
                "step_ms": round(dt * 1e3, 3),
                "tok_per_sec": round(b / dt, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"batch": b, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("batches", nargs="*", type=int, default=[8, 16, 32, 64])
    ap.add_argument("--max-seq", type=int, default=1024)
    a = ap.parse_args()
    main(tuple(a.batches) or (8, 16, 32, 64), max_seq=a.max_seq)
