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


def build_int4_params(cfg, seed=0):
    """Stacked serving params generated ON DEVICE inside ONE jitted program
    (remote compiles here cost minutes and host->device uploads run at
    ~10 MB/s, so both the transfer-per-matrix and the compile-per-RNG-call
    patterns are ruinous)."""
    import jax
    import jax.numpy as jnp
    import functools
    L = cfg.num_layers
    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    @jax.jit
    def gen(key):
        ks = iter(jax.random.split(key, 32))

        def packed(k, n):
            # uint8 directly via random.bits — randint would materialize an
            # int32 intermediate 4x the packed size (the round-1 OOM: the
            # up/gate/down int32 temps alone were ~13 GB).  Plane-major
            # layout ("wpm", params.repack_plane_major): random bytes are
            # layout-agnostic, the KEY selects the free-reshape un-pair path
            wp = jax.random.bits(next(ks), (L, k, n // 2), dtype=jnp.uint8)
            return {"wpm": wp, "scale2": scales2(n, k), "b": None}

        def scales2(n, k):
            s = jax.random.uniform(next(ks), (L, 2, n // 2), minval=0.5,
                                   maxval=1.5) / (7 * np.sqrt(k))
            return s.astype(jnp.float32)

        def fused(k, ns):
            # fused-concat layout (serving.params.fuse_for_decode)
            wp2 = jax.random.bits(next(ks), (L, k, sum(ns) // 2),
                                  dtype=jnp.uint8)
            return {"wp2": wp2, "scales2": [scales2(n, k) for n in ns],
                    "bs": [None] * len(ns)}

        stacked = {
            "input_norm": None, "post_norm": None,
            "qkv": fused(d, (cfg.q_dim, cfg.kv_dim, cfg.kv_dim)),
            "o": packed(cfg.q_dim, d),
            "upgate": fused(d, (f, f)), "down": packed(f, d),
        }
        emb = (jax.random.normal(next(ks), (v, d)) * 0.01).astype(jnp.bfloat16)
        return {"embed": emb, "final_norm": None, "lm_head": emb.T,
                "layers_stacked": stacked}

    return gen(jax.random.PRNGKey(seed))


def build_bf16_params(cfg, seed=0):
    import jax
    import jax.numpy as jnp
    L = cfg.num_layers
    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    @jax.jit
    def gen(key):
        ks = iter(jax.random.split(key, 32))

        def dense(k, n):
            # NB: the scale must be a PYTHON float (weak type): an np.float64
            # scalar is strong and silently promotes the whole model to f32 —
            # 2x the HBM and an inflated int4-vs-16bit speedup (r3 OOM dump)
            w = jax.random.normal(next(ks), (L, k, n),
                                  dtype=jnp.bfloat16) * float(0.1 / np.sqrt(k))
            assert w.dtype == jnp.bfloat16
            return {"w": w, "b": None}

        stacked = {
            "input_norm": None, "post_norm": None,
            "q": dense(d, cfg.q_dim), "k": dense(d, cfg.kv_dim),
            "v": dense(d, cfg.kv_dim), "o": dense(cfg.q_dim, d),
            "up": dense(d, f), "gate": dense(d, f), "down": dense(f, d),
        }
        emb = (jax.random.normal(next(ks), (v, d)) * 0.01).astype(jnp.bfloat16)
        return {"embed": emb, "final_norm": None, "lm_head": emb.T,
                "layers_stacked": stacked}

    return gen(jax.random.PRNGKey(seed))


def synthetic_cache(sc, batch, fill_len=512):
    """Random pre-filled cache (no prefill program: remote compiles are
    minutes each, and decode throughput does not depend on cache CONTENT)."""
    import jax
    import jax.numpy as jnp
    from rsq_tpu.serving import model as S
    cache = S.init_cache(sc, batch)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    for name in cache:
        if name == "length":
            continue
        arr = cache[name]
        if arr.dtype == jnp.uint8:
            cache[name] = jax.random.bits(k1, arr.shape, dtype=jnp.uint8)
        else:
            cache[name] = jax.random.uniform(
                k2, arr.shape, minval=0.01, maxval=0.1).astype(arr.dtype)
    cache["length"] = jnp.full((batch,), fill_len, jnp.int32)
    return cache


def measure_decode(params, sc, batch, n1=8, n2=32, repeats=3):
    """Per-decode-step seconds via scan-length differencing.

    The cache is built INSIDE the jitted program (its construction cost
    cancels exactly in the n2-n1 differencing): as a loop-local temporary
    XLA can alias its buffers freely, where a donated-or-not argument
    cache kept a second copy alive — the allocation that OOM'd batch 64
    (BENCHMARKS r3 §5)."""
    import jax
    import jax.numpy as jnp
    from rsq_tpu.serving import model as S

    fill = min(512, sc.max_seq // 2)

    @jax.jit
    def run(params, tok, n):
        # DYNAMIC trip count: one compiled program serves every n (each
        # additional program costs minutes of remote compile here)
        cache = synthetic_cache(sc, batch, fill_len=fill)

        def body(i, carry):
            cache, tok = carry
            logits, cache = S.decode_step_stacked(params, cache, tok, sc)
            return (cache, jnp.argmax(logits, axis=-1))
        cache2, tok = jax.lax.fori_loop(0, n, body, (cache, tok))
        return tok

    tok0 = jnp.zeros((batch,), jnp.int32)
    # warm the single compile
    np.asarray(run(params, tok0, n1))
    np.asarray(run(params, tok0, n2))
    dts = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        np.asarray(run(params, tok0, n1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(params, tok0, n2))
        t2 = time.perf_counter() - t0
        dts.append((t2 - t1) / (n2 - n1))
    # MEDIAN, not min: the differenced estimate is biased LOW when the
    # short chain's timing catches a stray tunnel pause (bimodal 5.6 vs
    # 7.4 ms observed r5) — min() selects exactly those glitches
    return float(np.median(dts))


def measure_decode_paged(params, sc, batch, page=512, n1=8, n2=32,
                         repeats=3):
    """Per-step seconds of the PAGED fast decode (the north-star serving
    path: continuous batching over the page pool).  Same differencing
    discipline as measure_decode; pool + tables built inside the jit."""
    import jax
    import jax.numpy as jnp
    from rsq_tpu.kernels import paged_kv as PKV
    from rsq_tpu.serving.paged import decode_step_paged_fast

    cfg = sc.cfg
    nps = -(-sc.max_seq // page)
    num_pages = batch * nps + 1
    fill = min(512, sc.max_seq // 2)
    ptab_np = (1 + np.arange(batch * nps)).reshape(batch, nps)

    @jax.jit
    def run(params, tok, n):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        pool = PKV.init_pool(cfg.num_layers, num_pages,
                             cfg.num_key_value_heads, cfg.head_dim_, page)
        pool["kq"] = jax.random.bits(k1, pool["kq"].shape, dtype=jnp.uint8)
        pool["vq"] = jax.random.bits(k2, pool["vq"].shape, dtype=jnp.uint8)
        ptab = jnp.asarray(ptab_np, jnp.int32)
        lengths = jnp.full((batch,), fill, jnp.int32)

        def body(i, carry):
            pool, tok, ln = carry
            logits, pool = decode_step_paged_fast(params, pool, ptab, ln,
                                                  tok, sc)
            return (pool, jnp.argmax(logits, axis=-1), ln + 1)
        pool, tok, _ = jax.lax.fori_loop(0, n, body, (pool, tok, lengths))
        return tok

    tok0 = jnp.zeros((batch,), jnp.int32)
    np.asarray(run(params, tok0, n1))
    np.asarray(run(params, tok0, n2))
    dts = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        np.asarray(run(params, tok0, n1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(params, tok0, n2))
        t2 = time.perf_counter() - t0
        dts.append((t2 - t1) / (n2 - n1))
    return float(np.median(dts))  # median, not min: see measure_decode


def _log(msg):
    import jax
    mem = None
    try:
        stats = jax.devices()[0].memory_stats()
        mem = round(stats.get("bytes_in_use", 0) / 2**30, 2)
    except Exception:
        pass
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg} (hbm_gb={mem})",
          file=sys.stderr, flush=True)


_RESULT = {}  # best-effort result, printed even if later stages die


def _emit():
    print(json.dumps(_RESULT), flush=True)


def main():
    import os
    import jax
    # persistent compilation cache: remote compiles in this environment take
    # minutes; repeat bench runs should reuse executables
    try:
        os.makedirs("/root/repo/.jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from rsq_tpu.models.config import ModelConfig
    from rsq_tpu.serving import model as S

    fast = os.environ.get("RSQ_BENCH_FAST") == "1"
    cfg32 = ModelConfig.llama3_8b()
    batch = 8
    max_seq = 1024

    # int8-MXU QK in decode attention is part of the headline config since
    # r5 (RSQ_ATTN_INT8_QK=0 for the bf16-QK path): q's int8 round-trip is
    # the same error order as the bf16 cast the default path performs on q
    # (tile corr 0.99995; decode-trajectory NLL delta -0.2% = noise at 8B
    # dims, benchmarks/attn_int8_ppl.py, with a 1e-6 control showing the
    # random-init argmax metric is chaos-saturated), for ~0.1-0.7 ms/step.
    attn_i8 = os.environ.get("RSQ_ATTN_INT8_QK", "1") != "0"
    sc32 = S.ServingConfig(model=cfg32, a4=True, kv_int4=True,
                           kv_hadamard=True, online_had=True,
                           max_seq=max_seq, attn_int8_qk=attn_i8)

    # INT4 headline number FIRST; every later stage only refines
    # vs_baseline and must never cost us the value (round-1 bench OOM'd in
    # the bf16 stage, round-2 hit a compile-service 500 there — both times
    # the recorded value was null although int4 had measured fine).
    # HEADLINE = the PAGED fast decode (the north-star serving path:
    # continuous batching over the page pool), page 512; interleaved A/B
    # measured the paged path at parity with the contiguous one (<2%,
    # BENCHMARKS §1b — an earlier 7.07 ms single-shot was not
    # reproducible).
    _log("building int4 32L params")
    p32 = build_int4_params(cfg32)
    # int8 lm_head is the DEFAULT since r5: measured PPL delta at the real
    # (4096, 128256) head is +0.006% (benchmarks/lmhead_ppl.py) for
    # -0.7 ms/step of the bf16 head's 1.39 ms (trace r5).  Set
    # RSQ_INT8_LMHEAD=0 for the reference-matching bf16 head
    # (gptq_utils.py:547-565 keeps the head fp16).
    int8_head = os.environ.get("RSQ_INT8_LMHEAD", "1") != "0"
    if int8_head:
        from rsq_tpu.serving.model import quantize_lm_head
        p32 = quantize_lm_head(p32)
        _log("lm_head quantized to int8 (default; RSQ_INT8_LMHEAD=0 "
             "to disable)")
    _log("measuring paged int4 32L decode (page 512)")
    t32 = measure_decode_paged(p32, sc32, batch, page=512)
    _log(f"paged int4 32L step={t32*1e3:.2f} ms")
    _RESULT.update({
        "metric": "decode_tokens_per_sec_per_chip_llama3_8b_w4a4kv4",
        "value": round(batch / t32, 1), "unit": "tok/s",
        "vs_baseline": None,
        "detail": {"batch": batch, "max_seq": max_seq, "path": "paged",
                   "page": 512, "int8_lmhead": int8_head,
                   "attn_int8_qk": attn_i8,
                   "step_ms_int4_32L_paged": round(t32 * 1e3, 3)},
    })
    if fast:
        _RESULT["detail"]["fast_mode"] = True
        _emit()
        return

    try:
        _log("measuring contiguous int4 32L decode")
        t32c = measure_decode(p32, sc32, batch)
        _RESULT["detail"]["step_ms_int4_32L_contiguous"] = round(t32c * 1e3,
                                                                3)
        _log(f"contiguous int4 32L step={t32c*1e3:.2f} ms")
    except Exception as e:  # noqa: BLE001
        _RESULT["detail"]["contiguous_error"] = repr(e)[:160]
    gc.collect()

    # bf16 baseline: 32L bf16 (16 GB weights+emb) cannot fit in HBM, so
    # measure at REDUCED depths and extrapolate per-layer cost + fixed
    # overhead to 32 layers.  INTERLEAVED with int4 re-samples
    # (VERDICT r4 #4): the chip drifts ±5-10% between processes and
    # phases, which swung vs_baseline 2.25x-2.59x between same-day runs
    # when int4 and bf16 were measured in disjoint phases.  Per depth,
    # alternate [int4 paged, bf16] measurements in one process and take
    # the MEDIAN of each side; the ratio then compares time-adjacent
    # samples.  The int4 params stay resident (4.3 GB next to the 9 GB
    # 16L bf16 model still fits v5e's 16 GB; on OOM that depth falls back
    # to bf16-only).
    bf_times = {}
    int4_samples = []
    for nl in (8, 12, 16):
        try:
            cfgN = dataclasses.replace(cfg32, num_layers=nl)
            scN = S.ServingConfig(model=cfgN, a4=False, kv_int4=False,
                                  kv_hadamard=False, online_had=False,
                                  max_seq=max_seq)
            _log(f"building bf16 {nl}L params")
            pb = build_bf16_params(cfgN)
            samples = []
            for r in range(3):
                try:
                    ti = measure_decode_paged(p32, sc32, batch, page=512,
                                              repeats=1)
                    int4_samples.append(ti)
                except Exception as e:  # noqa: BLE001 — OOM at 16L etc.
                    _RESULT["detail"].setdefault(
                        "interleave_int4_errors", []).append(repr(e)[:80])
                samples.append(measure_decode(pb, scN, batch, repeats=1))
                _log(f"alt {r}: bf16 {nl}L={samples[-1]*1e3:.2f} ms, "
                     f"int4={int4_samples[-1]*1e3 if int4_samples else -1:.2f} ms")
            bf_times[nl] = float(np.median(samples))
            _log(f"bf16 {nl}L median step={bf_times[nl]*1e3:.2f} ms; "
                 "freeing")
            del pb
            gc.collect()
            _RESULT["detail"][f"step_ms_bf16_{nl}L"] = round(
                bf_times[nl] * 1e3, 3)
            _RESULT["detail"][f"bf16_{nl}L_samples"] = [
                round(s * 1e3, 3) for s in samples]
        except Exception as e:  # noqa: BLE001 — keep the headline value
            _log(f"bf16 {nl}L stage failed: {e!r}")
            _RESULT["detail"][f"bf16_{nl}L_error"] = repr(e)[:160]
            gc.collect()

    def fit32(a, b):
        layer = max(bf_times[b] - bf_times[a], 1e-9) / float(b - a)
        overhead = max(bf_times[a] - a * layer, 0.0)
        return overhead + 32.0 * layer

    tb32_est = None
    if 8 in bf_times and 12 in bf_times:
        tb32_est = fit32(8, 12)
        if 16 in bf_times:
            pred16 = (bf_times[8]
                      + (bf_times[12] - bf_times[8]) / 4.0 * 8.0)
            err = abs(pred16 - bf_times[16]) / bf_times[16]
            _RESULT["detail"]["bf16_fit_err_at_16L"] = round(err, 4)
            if err > 0.05:
                tb32_est = fit32(8, 16)
                _RESULT["detail"]["bf16_fit_anchor"] = "8-16"
    elif len(bf_times) >= 2:
        ks = sorted(bf_times)
        tb32_est = fit32(ks[0], ks[-1])
    elif bf_times:
        nl, t = next(iter(bf_times.items()))
        tb32_est = t * 32.0 / nl

    if tb32_est is not None:
        # the ratio's int4 side uses the interleaved median (time-adjacent
        # to the bf16 samples); the headline tok/s keeps the phase-1 value
        t32_ratio = float(np.median(int4_samples)) if int4_samples else t32
        _RESULT["vs_baseline"] = round(tb32_est / t32_ratio, 3)
        _RESULT["detail"]["step_ms_bf16_32L_est"] = round(tb32_est * 1e3, 3)
        _RESULT["detail"]["step_ms_int4_interleaved_median"] = round(
            t32_ratio * 1e3, 3)
        if int4_samples:
            ratios = [tb32_est / t for t in int4_samples]
            _RESULT["detail"]["vs_baseline_spread_pct"] = round(
                100.0 * (max(ratios) - min(ratios))
                / float(np.median(ratios)), 2)
    _emit()


def _main_guarded():
    """The remote compile service in this environment can wedge for long
    periods; emit a well-formed JSON line either way.  If the headline INT4
    measurement already landed, timeout/crash paths emit THAT (with whatever
    baseline refinement completed) instead of a null."""
    import signal

    def on_timeout(sig, frame):
        if _RESULT.get("value") is not None:
            _RESULT["detail"]["note"] = "timeout during baseline stage"
            _emit()
        else:
            print(json.dumps({
                "metric": "decode_tokens_per_sec_per_chip_llama3_8b_w4a4kv4",
                "value": None, "unit": "tok/s", "vs_baseline": None,
                "detail": {"error": "timeout waiting for TPU compile service"},
            }), flush=True)
        os_exit = getattr(__import__("os"), "_exit")
        os_exit(0)

    signal.signal(signal.SIGALRM, on_timeout)
    signal.alarm(int(__import__("os").environ.get("RSQ_BENCH_TIMEOUT", "3000")))
    try:
        main()
    except Exception as e:
        if _RESULT.get("value") is not None:
            _RESULT["detail"]["error"] = repr(e)[:200]
            _emit()
        else:
            print(json.dumps({
                "metric": "decode_tokens_per_sec_per_chip_llama3_8b_w4a4kv4",
                "value": None, "unit": "tok/s", "vs_baseline": None,
                "detail": {"error": repr(e)[:300]},
            }), flush=True)


if __name__ == "__main__":
    _main_guarded()
