"""Decode-step component ablation: where do the milliseconds go?

Measures the full 32L Llama-3-8B decode step under feature toggles:
  full        — W4A4 + INT4 KV (+Hadamard) + online Hadamards  (the headline)
  no_kv4      — bf16 KV cache path
  no_had      — online Hadamards off
  w4_only     — weight-only quant (no activation quant)
Prints one JSON line per config.
"""

import dataclasses
import gc
import json
import sys

sys.path.insert(0, "/root/repo")

from bench import build_int4_params, measure_decode  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rsq_tpu.models.config import ModelConfig
    from rsq_tpu.serving import model as S

    cfg = ModelConfig.llama3_8b()
    batch, max_seq = 8, 1024
    base = S.ServingConfig(model=cfg, a4=True, kv_int4=True,
                           kv_hadamard=True, online_had=True, max_seq=max_seq)
    variants = {
        "full": base,
        "no_kv4": dataclasses.replace(base, kv_int4=False, kv_hadamard=False),
        "no_had": dataclasses.replace(base, online_had=False,
                                      kv_hadamard=False),
        "w4_only": dataclasses.replace(base, a4=False),
    }
    params = build_int4_params(cfg)
    for name, sc in variants.items():
        try:
            dt = measure_decode(params, sc, batch)
            print(json.dumps({"config": name, "step_ms": round(dt * 1e3, 3)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "error": repr(e)[:200]}),
                  flush=True)
        gc.collect()


if __name__ == "__main__":
    main()
