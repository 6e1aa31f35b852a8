"""Prefill latency benchmark: Llama-3-8B W4A4KV4, counterpart of the
prefill leg of the reference's e2e/benchmark.py:89-183 (default prefill
2048 tokens).

Prefill is MXU-compute-bound (large M), unlike weight-read-bound decode:
useful FLOPs per step = 2 * tokens * 8B params.  Prints one JSON line per
(batch, prompt_len) with ms and achieved TFLOP/s vs the 197 bf16 TFLOP/s
v5e peak (int8 394).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_int4_params  # noqa: E402


def main(configs=((1, 2048), (4, 2048), (8, 512))):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rsq_tpu.models.config import ModelConfig
    from rsq_tpu.serving import model as S

    cfg = ModelConfig.llama3_8b()
    params = build_int4_params(cfg)
    # matmul weight count (decoder linears only; lm_head excluded)
    nweights = cfg.num_layers * (
        cfg.hidden_size * (cfg.q_dim + 2 * cfg.kv_dim)   # qkv
        + cfg.q_dim * cfg.hidden_size                    # o
        + 3 * cfg.hidden_size * cfg.intermediate_size)   # up/gate/down

    for batch, plen in configs:
        try:
            sc = S.ServingConfig(model=cfg, a4=True, kv_int4=True,
                                 kv_hadamard=True, online_had=True,
                                 max_seq=max(1024, plen + 16))
            ids = jnp.zeros((batch, plen), jnp.int32)
            cache0 = S.init_cache(sc, batch)

            @jax.jit
            def run(params, cache, ids, n):
                # serial chain over n prefill calls (cache threads through)
                def body(i, carry):
                    cache, acc = carry
                    ids2 = ids + (acc.astype(jnp.int32) % 2)
                    logits, cache = S.prefill_stacked(params, cache, ids2, sc)
                    return (cache, jnp.max(logits).astype(jnp.float32))
                return jax.lax.fori_loop(0, n, body, (cache, jnp.float32(0)))[1]

            n1, n2 = 2, 6
            float(run(params, cache0, ids, n1))
            float(run(params, cache0, ids, n2))
            best = None
            for _ in range(3):
                t0 = time.perf_counter(); float(run(params, cache0, ids, n1))
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); float(run(params, cache0, ids, n2))
                t2 = time.perf_counter() - t0
                dt = (t2 - t1) / (n2 - n1)
                best = dt if best is None else min(best, dt)
            flops = 2.0 * batch * plen * nweights
            print(json.dumps({
                "batch": batch, "prompt_len": plen,
                "prefill_ms": round(best * 1e3, 2),
                "tok_per_sec": round(batch * plen / best, 1),
                "tflops": round(flops / best / 1e12, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"batch": batch, "prompt_len": plen,
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    args = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    main(tuple(args) or ((1, 2048), (4, 2048), (8, 512)))
