"""Quality delta of the int8-MXU decode-attention QK path at real dims.

attn_int8_qk (kernels/kv_cache._attend_tile) rounds q to symmetric int8
per (head, group) row before the QK contraction — the same error order
as the bf16 cast the default path performs on q — and feeds the UNSIGNED
cache nibbles to the int8 MXU (2x the bf16 rate on v5e, worth
~0.1-0.7 ms of the ~7.5 ms Llama-3-8B decode step depending on chip
drift).  Following the int8-lm_head precedent (VERDICT r4 #6,
benchmarks/lmhead_ppl.py), the knob needs its quality cost on the record
before it can carry the headline.

No pre-trained weights exist in this environment, so the experiment runs
the serving DECODE trajectory itself at llama3-8b dimensions (random
init, --layers deep): prefill a synthetic prompt, decode N steps twice —
int8_qk on/off from the SAME prefilled cache — and report (a) per-step
next-token NLL of the synthetic stream under both paths (the PPL-delta
analogue) and (b) per-step logit agreement (max|d|, corr), which is the
quantity that bounds any downstream eval delta.

Usage: python benchmarks/attn_int8_ppl.py [--layers 4] [--steps 128]
Prints one JSON line.
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prefill", type=int, default=256)
    ap.add_argument("--steps", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rsq_tpu.models.config import ModelConfig
    from rsq_tpu.serving import model as S
    import bench as BB

    cfg = dataclasses.replace(ModelConfig.llama3_8b(),
                              num_layers=args.layers)
    params = BB.build_int4_params(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (args.batch,
                                         args.prefill + args.steps + 1)),
        jnp.int32)

    def trajectory(int8_qk):
        sc = S.ServingConfig(model=cfg, a4=True, kv_int4=True,
                             kv_hadamard=True, online_had=True,
                             max_seq=args.prefill + args.steps + 8,
                             attn_int8_qk=int8_qk)
        cache = S.init_cache(sc, args.batch)
        logits, cache = S.prefill_fast(params, cache,
                                       ids[:, :args.prefill], sc)
        step = jax.jit(lambda p, c, t: S._decode_step_fast(p, c, t, sc))
        outs = []
        for t in range(args.steps):
            logits, cache = step(params, cache, ids[:, args.prefill + t])
            outs.append(np.asarray(logits, np.float32))
        return np.stack(outs)  # (steps, batch, V)

    lg_bf = trajectory(False)
    lg_i8 = trajectory(True)

    # LOCKSTEP: the kernel's direct per-step perturbation, free of
    # trajectory compounding — both paths compute each step's logits from
    # the SAME (bf16-path) cache state; only the bf16 path advances it.
    # Random-init a4 cascades are chaotic (BENCHMARKS r5: ulp-level
    # changes reshuffle near-tie int4 codes), so free-running trajectory
    # decorrelation measures chaos, not harm; this isolates the cause.
    def lockstep():
        sc_bf = S.ServingConfig(model=cfg, a4=True, kv_int4=True,
                                kv_hadamard=True, online_had=True,
                                max_seq=args.prefill + args.steps + 8,
                                attn_int8_qk=False)
        sc_i8 = dataclasses.replace(sc_bf, attn_int8_qk=True)
        cache = S.init_cache(sc_bf, args.batch)
        _, cache = S.prefill_fast(params, cache, ids[:, :args.prefill],
                                  sc_bf)
        step_bf = jax.jit(
            lambda p, c, t: S._decode_step_fast(p, c, t, sc_bf))
        step_i8 = jax.jit(
            lambda p, c, t: S._decode_step_fast(p, c, t, sc_i8))
        d_max, d_sum, n = 0.0, 0.0, 0
        agree = 0
        for t in range(args.steps):
            tok = ids[:, args.prefill + t]
            lg_a, cache2 = step_bf(params, cache, tok)
            lg_b, _ = step_i8(params, cache, tok)
            a = np.asarray(lg_a, np.float32)
            b = np.asarray(lg_b, np.float32)
            d = np.abs(a - b)
            d_max = max(d_max, float(d.max()))
            d_sum += float(d.sum())
            n += d.size
            agree += int((a.argmax(-1) == b.argmax(-1)).sum())
            cache = cache2
        return d_max, d_sum / n, agree / (args.steps * args.batch)

    ls_max, ls_mean, ls_agree = lockstep()

    # next-token NLL of the synthetic stream under each path
    tgt = np.asarray(ids[:, args.prefill + 1:
                         args.prefill + args.steps + 1]).T  # (steps, batch)

    def nll(lg):
        x = lg - lg.max(-1, keepdims=True)
        logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
        return float(-np.take_along_axis(
            logp, tgt[..., None], -1).mean())

    n_bf, n_i8 = nll(lg_bf), nll(lg_i8)
    d = np.abs(lg_bf - lg_i8)
    corr = float(np.corrcoef(lg_bf.ravel(), lg_i8.ravel())[0, 1])
    agree = float((lg_bf.argmax(-1) == lg_i8.argmax(-1)).mean())
    print(json.dumps({
        "metric": "attn_int8_qk_decode_delta",
        "layers": args.layers, "batch": args.batch,
        "prefill": args.prefill, "steps": args.steps,
        "nll_bf16_qk": round(n_bf, 6), "nll_int8_qk": round(n_i8, 6),
        "nll_delta_pct": round(100 * (n_i8 - n_bf) / n_bf, 4),
        "ppl_delta_pct": round(100 * (np.exp(n_i8) / np.exp(n_bf) - 1), 4),
        "logit_max_abs_delta": round(float(d.max()), 4),
        "logit_mean_abs_delta": round(float(d.mean()), 6),
        "logit_corr": round(corr, 6),
        "argmax_agreement": round(agree, 4),
        "lockstep_logit_max_abs_delta": round(ls_max, 4),
        "lockstep_logit_mean_abs_delta": round(ls_mean, 6),
        "lockstep_argmax_agreement": round(ls_agree, 4),
    }))


if __name__ == "__main__":
    main()
