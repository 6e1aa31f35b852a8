"""PPL delta of the int8 lm_head at real Llama-3-8B head dimensions.

VERDICT r4 #6: the int8 lm_head knob (serving.model.quantize_lm_head, the
w8 Pallas kernel) was justified only by a tiny-random-model logit test;
this measures the quantity that actually gates promoting it into the
headline: the perplexity delta caused by quantizing the (4096, 128256)
head, at the serving stack's own numerics.

No pre-trained weights exist in this environment (no network), so the
experiment isolates the head exactly: hidden states come from a
random-init llama3-8b-dimensioned decoder (4 layers — the head does not
care how many layers produced its input), targets are the synthetic
stream's own next tokens, and the ONLY varied factor is bf16 vs int8
head.  PPL here is the real CE->exp computation over ~128k positions.

The reference keeps the head fp16 (fake_quant/gptq_utils.py:547-565
forces 16 bits for lm_head), so a promoted int8 default needs this
number on the record.

Usage: python benchmarks/lmhead_ppl.py [--layers 4] [--seqs 64]
Prints one JSON line with both PPLs and the delta.
"""

import argparse
import dataclasses
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--seqs", type=int, default=64)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--bits", type=int, default=8, choices=(8, 4))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rsq_tpu.models.config import ModelConfig
    from rsq_tpu.serving.model import lm_head_logits, quantize_lm_head
    import bench as BB

    cfg = dataclasses.replace(ModelConfig.llama3_8b(),
                              num_layers=args.layers)
    params = BB.build_int4_params(cfg)
    params_q = quantize_lm_head(params, bits=args.bits)
    d, V = cfg.hidden_size, cfg.vocab_size

    # hidden states: run the serving layers over synthetic prompts so h has
    # the distribution the head actually sees (post-final-norm bf16)
    from rsq_tpu.serving import model as S
    sc = S.ServingConfig(model=cfg, a4=True, kv_int4=True, kv_hadamard=True,
                         online_had=True, max_seq=args.seqlen)
    rng = np.random.default_rng(0)

    @jax.jit
    def hidden_states(params, ids):
        # _prefill_fast's body up to the final norm, but emitting ALL
        # positions' hidden states (the PPL needs every position)
        ls = params["layers_stacked"]
        x = params["embed"][ids].astype(jnp.bfloat16)
        from rsq_tpu.models import llama as M
        cos, sin = M.rope_tables(cfg, jnp.arange(ids.shape[1]))
        from rsq_tpu.serving.model import _linear_fast, _sl
        b, s = ids.shape
        hd, nq, nkv = (cfg.head_dim_, cfg.num_attention_heads,
                       cfg.num_key_value_heads)
        for i in range(args.layers):
            h = M.rms_norm(x, _sl(ls.get("input_norm"), i), cfg.rms_norm_eps)
            h2d = h.reshape(b * s, -1)
            q, k, v = _linear_fast(h2d, ls["qkv"], i, sc)
            q = M.apply_rope(q.reshape(b, s, nq, hd), cos, sin)
            k = M.apply_rope(k.reshape(b, s, nkv, hd), cos, sin)
            v = v.reshape(b, s, nkv, hd)
            attn = M.attention(q, M.repeat_kv(k, nq // nkv),
                               M.repeat_kv(v, nq // nkv), None)
            o = _linear_fast(attn.reshape(b * s, -1), ls["o"], i, sc)
            x = x + o.reshape(b, s, -1).astype(x.dtype)
            h2 = M.rms_norm(x, _sl(ls.get("post_norm"), i), cfg.rms_norm_eps)
            up, gate = _linear_fast(h2.reshape(b * s, -1), ls["upgate"],
                                    i, sc)
            act = jax.nn.silu(gate.astype(jnp.float32)).astype(h2.dtype) * up
            dn = _linear_fast(act.reshape(b * s, -1), ls["down"], i, sc)
            x = x + dn.reshape(b, s, -1).astype(x.dtype)
        return M.rms_norm(x, params.get("final_norm"), cfg.rms_norm_eps)

    @jax.jit
    def batch_nll(params, h, tgt):
        logits = lm_head_logits(params, h)  # dispatches bf16 vs int8
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        return -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]

    stacked = params  # build_int4_params already returns stacked layout
    stacked_q = dict(stacked)
    stacked_q.pop("lm_head")
    for key in ("lm_head_q", "lm_head_scale", "lm_head_wp",
                "lm_head_scale4"):
        if key in params_q:
            stacked_q[key] = params_q[key]

    nll_bf16, nll_int8, n = 0.0, 0.0, 0
    for s0 in range(0, args.seqs, 8):
        ids = jnp.asarray(rng.integers(0, V, (8, args.seqlen)), jnp.int32)
        h = hidden_states(stacked, ids)
        tgt = ids[:, 1:]
        nll_bf16 += float(jnp.sum(batch_nll(stacked, h, tgt)))
        nll_int8 += float(jnp.sum(batch_nll(stacked_q, h, tgt)))
        n += int(tgt.size)

    ppl_bf16 = float(np.exp(nll_bf16 / n))
    ppl_int8 = float(np.exp(nll_int8 / n))
    print(json.dumps({
        "metric": f"lmhead_int{args.bits}_ppl_delta",
        "dims": [d, V], "positions": n,
        "ppl_bf16_head": round(ppl_bf16, 6),
        "ppl_quant_head": round(ppl_int8, 6),
        "delta_pct": round(100 * (ppl_int8 - ppl_bf16) / ppl_bf16, 4),
    }))


if __name__ == "__main__":
    main()
