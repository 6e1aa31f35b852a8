"""Headline benchmark: Llama-3-8B W4A4KV4 decode throughput on one chip.

Prints ONE JSON line:
  {"metric": "decode_tokens_per_sec_per_chip_llama3_8b_w4a4kv4",
   "value": <tokens/sec>, "unit": "tok/s", "vs_baseline": <speedup vs bf16>}

vs_baseline is the speedup over bf16-weight serving on the SAME chip.  The
bf16 32-layer model does not fit in 16 GB HBM alongside activations, so the
baseline is measured at 16 layers and extrapolated linearly in layer count
(per-layer cost + fixed embed/lm_head overhead, both measured).

Timing: the environment's TPU tunnel makes block_until_ready unreliable, so
each measurement runs the decode loop as ONE jitted lax.scan, forces a host
readback of the final tokens, and differences two scan lengths to cancel
dispatch/transfer overhead (min over repeats).
"""

import dataclasses
import gc
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _rand_bytes(rng, shape):
    return np.frombuffer(rng.bytes(int(np.prod(shape))),
                         dtype=np.uint8).reshape(shape)


def build_int4_params(cfg, seed=0):
    """Stacked (lax.scan) serving params. One layer of random weights is
    generated on host and broadcast to all layers on device (weight CONTENT
    is irrelevant to throughput; HBM still holds L physical copies)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    L = cfg.num_layers
    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def packed(k, n):
        wp = jnp.asarray(_rand_bytes(rng, (k, n // 2)))
        scale = (rng.uniform(0.5, 1.5, size=(n,)) /
                 (7 * np.sqrt(k))).astype(np.float32)
        return {"wp": jnp.broadcast_to(wp, (L, k, n // 2)).copy(),
                "scale": jnp.broadcast_to(jnp.asarray(scale), (L, n)).copy(),
                "b": None}

    stacked = {
        "input_norm": None, "post_norm": None,
        "q": packed(d, cfg.q_dim), "k": packed(d, cfg.kv_dim),
        "v": packed(d, cfg.kv_dim), "o": packed(cfg.q_dim, d),
        "up": packed(d, f), "gate": packed(d, f), "down": packed(f, d),
    }
    emb = (rng.standard_normal((v, d)) * 0.01).astype(np.float32)
    return {"embed": jnp.asarray(emb, jnp.bfloat16), "final_norm": None,
            "lm_head": jnp.asarray(emb.T.copy(), jnp.bfloat16),
            "layers_stacked": stacked}


def build_bf16_params(cfg, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    L = cfg.num_layers
    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def dense(k, n):
        w = ((_rand_bytes(rng, (k, n)).astype(np.float32) - 127.5)
             / (128 * np.sqrt(k))).astype(np.float32)
        wj = jnp.asarray(w, jnp.bfloat16)
        return {"w": jnp.broadcast_to(wj, (L, k, n)).copy(), "b": None}

    stacked = {
        "input_norm": None, "post_norm": None,
        "q": dense(d, cfg.q_dim), "k": dense(d, cfg.kv_dim),
        "v": dense(d, cfg.kv_dim), "o": dense(cfg.q_dim, d),
        "up": dense(d, f), "gate": dense(d, f), "down": dense(f, d),
    }
    emb = (rng.standard_normal((v, d)) * 0.01).astype(np.float32)
    return {"embed": jnp.asarray(emb, jnp.bfloat16), "final_norm": None,
            "lm_head": jnp.asarray(emb.T.copy(), jnp.bfloat16),
            "layers_stacked": stacked}


def measure_decode(params, sc, batch, n1=8, n2=40, repeats=3):
    """Per-decode-step seconds via scan-length differencing."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from rsq_tpu.serving import model as S

    cache = S.init_cache(sc, batch)
    ids = jnp.zeros((batch, 16), jnp.int32)
    _, cache = S.prefill_stacked(params, cache, ids, sc)

    @partial(jax.jit, static_argnames=("n",))
    def run(params, cache, tok, n):
        def step(carry, _):
            cache, tok = carry
            logits, cache = S.decode_step_stacked(params, cache, tok, sc)
            return (cache, jnp.argmax(logits, axis=-1)), None
        (cache, tok), _ = jax.lax.scan(step, (cache, tok), None, length=n)
        return tok

    tok0 = jnp.zeros((batch,), jnp.int32)
    # warm both compiles
    np.asarray(run(params, cache, tok0, n1))
    np.asarray(run(params, cache, tok0, n2))
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(run(params, cache, tok0, n1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(params, cache, tok0, n2))
        t2 = time.perf_counter() - t0
        dt = (t2 - t1) / (n2 - n1)
        best = dt if best is None else min(best, dt)
    return best


def main():
    import jax
    from rsq_tpu.models.config import ModelConfig
    from rsq_tpu.serving import model as S

    cfg32 = ModelConfig.llama3_8b()
    cfg16 = dataclasses.replace(cfg32, num_layers=16)
    batch = 8
    max_seq = 1024

    sc32 = S.ServingConfig(model=cfg32, a4=True, kv_int4=True,
                           kv_hadamard=True, online_had=True, max_seq=max_seq)
    sc16 = dataclasses.replace(sc32, model=cfg16)
    sc16_bf = S.ServingConfig(model=cfg16, a4=False, kv_int4=False,
                              kv_hadamard=False, online_had=False,
                              max_seq=max_seq)

    # INT4: full depth and half depth (for per-layer cost)
    p32 = build_int4_params(cfg32)
    t32 = measure_decode(p32, sc32, batch)
    del p32
    gc.collect()

    p16 = build_int4_params(cfg16)
    t16 = measure_decode(p16, sc16, batch)
    del p16
    gc.collect()

    # bf16 baseline at half depth
    pb = build_bf16_params(cfg16)
    tb16 = measure_decode(pb, sc16_bf, batch)
    del pb
    gc.collect()

    layer_int4 = (t32 - t16) / 16.0
    overhead = max(t16 - 16.0 * layer_int4, 0.0)  # embed + lm_head + sampling
    layer_bf16 = max(tb16 - overhead, 1e-9) / 16.0
    tb32_est = overhead + 32.0 * layer_bf16

    toks_per_sec = batch / t32
    speedup = tb32_est / t32

    print(json.dumps({
        "metric": "decode_tokens_per_sec_per_chip_llama3_8b_w4a4kv4",
        "value": round(toks_per_sec, 1),
        "unit": "tok/s",
        "vs_baseline": round(speedup, 3),
        "detail": {
            "batch": batch, "max_seq": max_seq,
            "step_ms_int4_32L": round(t32 * 1e3, 3),
            "step_ms_int4_16L": round(t16 * 1e3, 3),
            "step_ms_bf16_16L": round(tb16 * 1e3, 3),
            "step_ms_bf16_32L_est": round(tb32_est * 1e3, 3),
        },
    }))


if __name__ == "__main__":
    main()
