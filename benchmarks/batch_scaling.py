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


def main(batches=(8, 16, 32, 64)):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rsq_tpu.models.config import ModelConfig
    from rsq_tpu.serving import model as S

    cfg = ModelConfig.llama3_8b()
    params = build_int4_params(cfg)
    for b in batches:
        try:
            # the cache is jit-local in measure_decode now (no second
            # argument copy), so every batch runs at full max_seq 1024
            sc = S.ServingConfig(model=cfg, a4=True, kv_int4=True,
                                 kv_hadamard=True, online_had=True,
                                 max_seq=1024)
            dt = measure_decode(params, sc, b)
            print(json.dumps({
                "batch": b, "step_ms": round(dt * 1e3, 3),
                "tok_per_sec": round(b / dt, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"batch": b, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (8, 16, 32, 64))
