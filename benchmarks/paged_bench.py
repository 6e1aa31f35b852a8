"""On-chip paged-engine decode benchmark (the north-star serving path).

Measures `decode_step_paged_fast` — the copy-free stacked paged decode the
PagedServingEngine runs — at Llama-3-8B W4A4KV4 shapes on the real chip,
next to the contiguous-slot fast path for reference.  VERDICT r4 item 1's
"done" bar: paged decode within ~15% of the contiguous step.

The page size sweep exists because the paged grid runs one (all-heads)
cell per page: smaller pages mean more grid cells per sequence at ~0.65 us
of grid overhead each (BENCHMARKS §3), so tiny pages trade decode speed
for allocation granularity.  The reference fixes page_size=16 tokens for
CUDA warps (quarot/transformers/kv_cache.py); on TPU the natural page is
one or more 128-lane tiles.

Usage:  python benchmarks/paged_bench.py [--pages 128,256,512] [--batch 8]
Prints one JSON line per configuration.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench as B  # noqa: E402  (param builders + timing conventions)


def run_paged(cfg, sc, batch, page, fill, n1=8, n2=32, repeats=3):
    import jax
    import jax.numpy as jnp
    from rsq_tpu.kernels import paged_kv as PKV
    from rsq_tpu.serving.paged import decode_step_paged_fast

    np_per_slot = -(-sc.max_seq // page)
    num_pages = batch * np_per_slot + 1
    params = B.build_int4_params(cfg)

    pool = PKV.init_pool(cfg.num_layers, num_pages, cfg.num_key_value_heads,
                         cfg.head_dim_, page)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    pool["kq"] = jax.random.bits(k1, pool["kq"].shape, dtype=jnp.uint8)
    pool["vq"] = jax.random.bits(k2, pool["vq"].shape, dtype=jnp.uint8)
    # identity page table: slot b owns pages [1 + b*np_per_slot, ...)
    ptab = (1 + np.arange(batch * np_per_slot)).reshape(batch, np_per_slot)
    ptab = jnp.asarray(ptab, jnp.int32)
    lengths0 = jnp.full((batch,), fill, jnp.int32)

    @jax.jit
    def run(params, pool, tok, lengths, n):
        def body(i, carry):
            pool, tok, lengths = carry
            logits, pool = decode_step_paged_fast(params, pool, ptab,
                                                  lengths, tok, sc)
            return (pool, jnp.argmax(logits, axis=-1), lengths + 1)
        pool, tok, _ = jax.lax.fori_loop(0, n, body, (pool, tok, lengths))
        return tok

    tok0 = jnp.zeros((batch,), jnp.int32)
    np.asarray(run(params, pool, tok0, lengths0, n1))
    np.asarray(run(params, pool, tok0, lengths0, n2))
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(run(params, pool, tok0, lengths0, n1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(params, pool, tok0, lengths0, n2))
        t2 = time.perf_counter() - t0
        dt = (t2 - t1) / (n2 - n1)
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default="128,256,512")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--fill", type=int, default=512)
    ap.add_argument("--contiguous", action="store_true",
                    help="also measure the contiguous fast path")
    ap.add_argument("--interleave", type=int, default=0, metavar="N",
                    help="N alternating contiguous/paged rounds (first "
                         "--pages entry) to cancel chip-level drift")
    args = ap.parse_args()

    import os
    import jax
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rsq_tpu.models.config import ModelConfig
    from rsq_tpu.serving import model as S

    cfg = ModelConfig.llama3_8b()
    sc = S.ServingConfig(model=cfg, a4=True, kv_int4=True, kv_hadamard=True,
                         online_had=True, max_seq=args.max_seq)

    if args.interleave:
        # A/B the contiguous path against ONE page size, alternating
        # measurements in a single process so chip-level drift (tunnel,
        # frequency) cancels — single-shot runs showed ±10-20% swings.
        page = int(args.pages.split(",")[0])
        p = B.build_int4_params(cfg)
        rows = []
        for r in range(args.interleave):
            tc = B.measure_decode(p, sc, args.batch, repeats=1)
            tp = run_paged(cfg, sc, args.batch, page, args.fill, repeats=1)
            rows.append((tc, tp))
            print(json.dumps({"round": r, "contig_ms": round(tc * 1e3, 3),
                              "paged_ms": round(tp * 1e3, 3)}), flush=True)
        bc = min(t for t, _ in rows)
        bp = min(t for _, t in rows)
        print(json.dumps({"path": "interleaved", "page": page,
                          "batch": args.batch,
                          "contig_ms_best": round(bc * 1e3, 3),
                          "paged_ms_best": round(bp * 1e3, 3)}), flush=True)
        return

    if args.contiguous:
        p = B.build_int4_params(cfg)
        t = B.measure_decode(p, sc, args.batch)
        print(json.dumps({"path": "contiguous", "batch": args.batch,
                          "step_ms": round(t * 1e3, 3),
                          "tok_s": round(args.batch / t, 1)}), flush=True)
        del p

    for page in map(int, args.pages.split(",")):
        t = run_paged(cfg, sc, args.batch, page, args.fill)
        print(json.dumps({"path": "paged", "page": page,
                          "batch": args.batch,
                          "step_ms": round(t * 1e3, 3),
                          "tok_s": round(args.batch / t, 1)}), flush=True)


if __name__ == "__main__":
    main()
