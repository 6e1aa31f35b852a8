"""Variant sweep for the stacked decode W4A4 kernel (the hot path: 8.6 ms
of the 15 ms step is these matmuls at ~400 GB/s vs the 819 GB/s roofline).

Hypothesis from trace_decode r3: the kernel is VPU-bound on nibble unpack
(cast + mask + shift + where + concat ≈ 10 vector ops/word vs DMA at
~4 B/cycle/lane).  Variants:

  base     : current _w4a4_kernel_i8_pref (mask+where sign, concat, 1 dot)
  twodot   : no concat — two dots into two acc slices
  shift    : sign-extend via (w<<28)>>28 / (w<<24)>>28 (2 ops/plane), 2 dots
  shift1   : shift unpack + concat + 1 dot
  int4     : adjacent-packed weights bitcast u8 -> int4 pairs, 1 dot
             (hardware sign-extend; needs jnp.int4 dot support)

Each runs at decode shape M=8 on stacked L=8 upgate weights (K=4096,
Nh=14336), per-iteration layer indexing via scalar prefetch (no HBM copy).

Usage: python benchmarks/stacked_sweep.py
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

M, K, NH = 8, 4096, 14336
L = 8
N1, N2 = 64, 576


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (M, K)) * 0.1).astype(jnp.bfloat16)
    wp = jax.jit(lambda k: jax.random.bits(
        k, (L, K, NH), dtype=jnp.uint8))(key)
    scale2 = jnp.full((2, NH), 1e-2, jnp.float32)
    bytes_packed = K * NH

    def timed(fn, *args, repeats=3):
        def leg(n):
            best = None
            for _ in range(repeats):
                t0 = time.perf_counter()
                np.asarray(jax.block_until_ready(fn(*args, n)))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best
        np.asarray(jax.block_until_ready(fn(*args, N1)))
        np.asarray(jax.block_until_ready(fn(*args, N2)))
        return (leg(N2) - leg(N1)) / (N2 - N1)

    def report(name, dt):
        print(json.dumps({
            "variant": name, "ms": round(dt * 1e3, 4),
            "GBps": round(bytes_packed / dt / 1e9, 1),
            "roofline_pct": round(100 * bytes_packed / 819e9 / dt, 1)}),
            flush=True)

    # ---- kernel bodies -----------------------------------------------
    def unpack_maskwhere(w):
        wi = w.astype(jnp.int32)
        lo = wi & 0x0F
        hi = (wi >> 4) & 0x0F
        lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.int8)
        hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.int8)
        return lo, hi

    def unpack_shift(w):
        wi = w.astype(jnp.int32)
        lo = ((wi << 28) >> 28).astype(jnp.int8)
        hi = ((wi << 24) >> 28).astype(jnp.int8)
        return lo, hi

    def make_kernel(variant):
        def kern(idx_ref, x_ref, xs_ref, wp_ref, scale_ref, out_ref, acc_ref,
                 *, nsteps_k):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            inv = 1.0 / xs_ref[...]
            xq = jnp.clip(jnp.round(x_ref[...].astype(jnp.float32) * inv),
                          -8, 7).astype(jnp.int8)
            w = wp_ref[0]
            if variant == "base":
                lo, hi = unpack_maskwhere(w)
                w2 = jnp.concatenate([lo, hi], axis=1)
                y = jnp.dot(xq, w2, preferred_element_type=jnp.int32)
                bn = lo.shape[1]
                acc_ref[:, 0, :] += y[:, :bn]
                acc_ref[:, 1, :] += y[:, bn:]
            elif variant == "twodot":
                lo, hi = unpack_maskwhere(w)
                acc_ref[:, 0, :] += jnp.dot(
                    xq, lo, preferred_element_type=jnp.int32)
                acc_ref[:, 1, :] += jnp.dot(
                    xq, hi, preferred_element_type=jnp.int32)
            elif variant == "shift":
                lo, hi = unpack_shift(w)
                acc_ref[:, 0, :] += jnp.dot(
                    xq, lo, preferred_element_type=jnp.int32)
                acc_ref[:, 1, :] += jnp.dot(
                    xq, hi, preferred_element_type=jnp.int32)
            elif variant == "shift1":
                lo, hi = unpack_shift(w)
                w2 = jnp.concatenate([lo, hi], axis=1)
                y = jnp.dot(xq, w2, preferred_element_type=jnp.int32)
                bn = lo.shape[1]
                acc_ref[:, 0, :] += y[:, :bn]
                acc_ref[:, 1, :] += y[:, bn:]
            elif variant == "u32":
                # operate on packed u32 words (4 bytes/lane-op instead of
                # widening every byte to i32): one AND (+1 shift for hi)
                # + xor-bias in u32, then a single i8 subtract after
                # bitcasting back — ~4x fewer VPU ops than shift-unpack
                w32 = pltpu.bitcast(w, jnp.uint32)        # (bk/4, bn)
                lo32 = (w32 & 0x0F0F0F0F) ^ 0x08080808
                hi32 = ((w32 >> 4) & 0x0F0F0F0F) ^ 0x08080808
                lo = pltpu.bitcast(lo32, jnp.int8) - 8    # (bk, bn) in [-8,7]
                hi = pltpu.bitcast(hi32, jnp.int8) - 8
                acc_ref[:, 0, :] += jnp.dot(
                    xq, lo, preferred_element_type=jnp.int32)
                acc_ref[:, 1, :] += jnp.dot(
                    xq, hi, preferred_element_type=jnp.int32)
            elif variant == "int4":
                w4 = jax.lax.bitcast_convert_type(w, jnp.int4)  # (bk,bn,2)
                w4 = w4.reshape(w.shape[0], -1)                 # (bk,2bn)
                y = jnp.dot(xq.astype(jnp.int4), w4,
                            preferred_element_type=jnp.int32)
                bn = w.shape[1]
                acc_ref[:, 0, :] += y[:, 0::2][:, :bn]
                acc_ref[:, 1, :] += y[:, 1::2][:, :bn]

            @pl.when(k == nsteps_k - 1)
            def _():
                deq = (acc_ref[...].astype(jnp.float32)
                       * xs_ref[...][:, None, :]
                       * scale_ref[...].astype(jnp.float32))
                out_ref[...] = deq.astype(out_ref.dtype)
        return kern

    def make_call(variant, bn, bk):
        kern = make_kernel(variant)
        nk = K // bk
        grid = (1, NH // bn, nk)

        @jax.jit
        def one(xx, wall, s2, layer):
            absmax = jnp.max(jnp.abs(xx.astype(jnp.float32)), axis=1,
                             keepdims=True)
            xs = jnp.where(absmax == 0, 1.0, absmax / 7.0)
            return pl.pallas_call(
                functools.partial(kern, nsteps_k=nk),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=grid,
                    in_specs=[
                        pl.BlockSpec((M, bk), lambda i, j, k, idx: (i, k)),
                        pl.BlockSpec((M, 1), lambda i, j, k, idx: (i, 0)),
                        pl.BlockSpec((1, bk, bn),
                                     lambda i, j, k, idx: (idx[0], k, j)),
                        pl.BlockSpec((2, bn), lambda i, j, k, idx: (0, j)),
                    ],
                    out_specs=pl.BlockSpec((M, 2, bn),
                                           lambda i, j, k, idx: (i, 0, j)),
                    scratch_shapes=[pltpu.VMEM((M, 2, bn), jnp.int32)],
                ),
                out_shape=jax.ShapeDtypeStruct((M, 2, NH), xx.dtype),
                interpret=False,
            )(jnp.asarray(layer, jnp.int32).reshape(1), xx, xs, wall, s2)

        @jax.jit
        def run(xx, wall, s2, n):
            def body(i, acc):
                xi = xx + (acc[0, 0, 0] * 1e-30).astype(xx.dtype)
                y = one(xi, wall, s2, i % L)
                return y[:, :, :8].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body,
                                     jnp.zeros((M, 2, 8), jnp.float32))
        return run

    shapes = [(2048, 1024), (3584, 1024), (2048, 2048), (7168, 512),
              (1792, 2048), (14336, 256)]
    variants = (sys.argv[1:] or
                ["base", "twodot", "shift", "shift1", "int4", "u32"])
    for variant in variants:
        for bn, bk in (shapes if variant in ("base", "shift", "u32") else
                       [(2048, 1024), (2048, 2048)]):
            try:
                dt = timed(make_call(variant, bn, bk), x, wp, scale2)
                report(f"{variant}_n{bn}_k{bk}", dt)
            except Exception as e:
                print(json.dumps({"variant": f"{variant}_n{bn}_k{bk}",
                                  "error": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
