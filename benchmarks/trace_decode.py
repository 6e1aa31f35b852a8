"""Capture a jax.profiler trace of the W4A4KV4 decode step and attribute
device time per HLO op — the evidence VERDICT round-2 asked for ("nothing
in the repo measures or explains where the time goes").

Usage: python benchmarks/trace_decode.py [--layers 32] [--batch 8] [--steps 8]

Prints the top device ops by total duration plus a grouped summary
(fusions / pallas custom-calls / dynamic-update-slice / copies).
"""

import argparse
import collections
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def capture(fn, outdir):
    import jax
    jax.profiler.start_trace(outdir)
    try:
        fn()
    finally:
        jax.profiler.stop_trace()


def load_events(outdir):
    """Aggregate device-plane events from the captured xplane."""
    import jax
    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {outdir}"
    pd = jax.profiler.ProfileData.from_file(sorted(paths)[-1])
    per_op = collections.Counter()
    per_op_n = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            lname = line.name or ""
            # XLA op lines carry per-HLO events; skip step/annotation lines
            if "XLA Ops" not in lname and "Ops" not in lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns
                per_op[ev.name] += dur
                per_op_n[ev.name] += 1
    return per_op, per_op_n


def classify(name):
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n:
        return "pallas_custom_call"
    if "dynamic-update-slice" in n:
        return "dynamic_update_slice"
    if "copy" in n:
        return "copy"
    if "fusion" in n:
        return "fusion"
    if "dynamic-slice" in n:
        return "dynamic_slice"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "convolution" in n or "dot" in n:
        return "dot"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--outdir", default="/tmp/rsq_trace")
    ap.add_argument("--paged", type=int, default=0, metavar="PAGE",
                    help="trace the paged fast decode with this page size "
                         "instead of the contiguous path")
    ap.add_argument("--int8-head", action="store_true",
                    help="trace with the int8 lm_head (headline default)")
    ap.add_argument("--int8-qk", action="store_true",
                    help="trace with the int8-MXU attention QK path "
                         "(headline default)")
    args = ap.parse_args()

    import dataclasses
    import jax
    import jax.numpy as jnp
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rsq_tpu.models.config import ModelConfig
    from rsq_tpu.serving import model as S
    import bench as BB

    cfg = dataclasses.replace(ModelConfig.llama3_8b(),
                              num_layers=args.layers)
    sc = S.ServingConfig(model=cfg, a4=True, kv_int4=True, kv_hadamard=True,
                         online_had=True, max_seq=args.seq,
                         attn_int8_qk=args.int8_qk)
    params = BB.build_int4_params(cfg)
    if args.int8_head:
        params = S.quantize_lm_head(params)
    tok = jnp.zeros((args.batch,), jnp.int32)

    if args.paged:
        from rsq_tpu.kernels import paged_kv as PKV
        from rsq_tpu.serving.paged import decode_step_paged_fast
        page = args.paged
        nps = -(-sc.max_seq // page)
        pool = PKV.init_pool(cfg.num_layers, args.batch * nps + 1,
                             cfg.num_key_value_heads, cfg.head_dim_, page)
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        pool["kq"] = jax.random.bits(k1, pool["kq"].shape, dtype=jnp.uint8)
        pool["vq"] = jax.random.bits(k2, pool["vq"].shape, dtype=jnp.uint8)
        ptab = jnp.asarray(
            (1 + np.arange(args.batch * nps)).reshape(args.batch, nps),
            jnp.int32)
        lengths0 = jnp.full((args.batch,), min(512, sc.max_seq // 2),
                            jnp.int32)

        @jax.jit
        def run(params, pool, tok, n):
            def body(i, carry):
                pool, tok, ln = carry
                logits, pool = decode_step_paged_fast(params, pool, ptab,
                                                      ln, tok, sc)
                return (pool, jnp.argmax(logits, axis=-1), ln + 1)
            pool, tok, _ = jax.lax.fori_loop(0, n, body,
                                             (pool, tok, lengths0))
            return tok

        np.asarray(run(params, pool, tok, 2))
        capture(lambda: np.asarray(run(params, pool, tok, args.steps)),
                args.outdir)
    else:
        cache = BB.synthetic_cache(sc, args.batch)

        @jax.jit
        def run(params, cache, tok, n):
            def body(i, carry):
                cache, tok = carry
                logits, cache = S.decode_step_stacked(params, cache, tok, sc)
                return (cache, jnp.argmax(logits, axis=-1))
            cache, tok = jax.lax.fori_loop(0, n, body, (cache, tok))
            return tok

        # warm compile
        np.asarray(run(params, cache, tok, 2))

        capture(lambda: np.asarray(run(params, cache, tok, args.steps)),
                args.outdir)

    per_op, per_op_n = load_events(args.outdir)
    total = sum(per_op.values())
    print(f"total device ns: {total} over {args.steps} steps "
          f"({total/1e6/args.steps:.3f} ms/step)")
    groups = collections.Counter()
    for name, dur in per_op.items():
        groups[classify(name)] += dur
    print("\n-- groups --")
    for g, dur in groups.most_common():
        print(json.dumps({"group": g, "ms_per_step": round(dur/1e6/args.steps, 3),
                          "pct": round(100*dur/total, 1)}))
    print("\n-- top ops --")
    for name, dur in per_op.most_common(args.top):
        print(json.dumps({"op": name[:110], "ms_per_step": round(dur/1e6/args.steps, 4),
                          "count": per_op_n[name],
                          "pct": round(100*dur/total, 1)}))


if __name__ == "__main__":
    main()
