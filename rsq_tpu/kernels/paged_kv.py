"""Paged INT4 KV-cache attention (Pallas, page-table indirection in-kernel).

TPU counterpart of the reference's FlashInfer paged layout
(quarot/kernels/include/flashinfer/page.cuh:19 `paged_kv_t`,
decode.cuh:492 `BatchDecodeWithPagedKVCache`): the KV cache lives in a
global PAGE POOL shared by all sequences; each sequence owns a list of
page ids (the page table).  Unlike the contiguous-slot cache
(kernels/kv_cache.py), pages are not required to be physically adjacent,
so (a) memory is allocated on demand page-by-page, (b) sequences of very
different lengths don't reserve max_seq each, and (c) pages holding a
shared prompt prefix can be SHARED between sequences (prefix caching —
new capability, the reference has none).

TPU-native design:
- The page table is a scalar-prefetch argument
  (`pltpu.PrefetchScalarGridSpec`): the BlockSpec index_map reads
  `ptab[b, p]` to pick which pool page each grid step DMAs, so the kernel
  reads pages directly from HBM in table order — no gather, no
  materialized contiguous copy.
- Page geometry: pool pages are (Hkv, D/2, page_size) with the token axis
  in LANES (page_size a multiple of 128), the same sequence-in-lanes
  layout as the contiguous kernel, so each DMA tile is full-width int8.
- Same zero-materialization dequant algebra as kernels/kv_cache.py: the
  packed nibbles feed the MXU as bf16 and per-token scale/zero fold into
  rank-1 epilogues.

Padding page-table entries MUST point at a valid page id (0 is fine):
they are masked by `lengths` before contributing, but the DMA still runs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsq_tpu.kernels.kv_cache import (
    MASK_VALUE, _unpack_u4_bf16, asym_quant_pack_head, to_lane_major,
    unpack_dequant_head)


# ---------------------------------------------------------------------------
# Decode kernel
# ---------------------------------------------------------------------------

def _paged_decode_kernel(ptab_ref, len_ref, q_ref, kq_ref, kp_ref, vq_ref,
                         vp_ref, out_ref, m_ref, l_ref, acc_ref, *,
                         page, npages):
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    length = len_ref[pl.program_id(0)]
    base = p * page

    @pl.when(base < length)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)           # (Gp, D)
        dh = q.shape[-1] // 2
        q_lo = q[:, :dh].astype(jnp.bfloat16)
        q_hi = q[:, dh:].astype(jnp.bfloat16)
        qsum = jnp.sum(q, axis=1, keepdims=True)      # (Gp, 1)

        k_lo, k_hi = _unpack_u4_bf16(kq_ref[0, 0])    # (D/2, page)
        ks = kp_ref[0, 0, 0, :].astype(jnp.float32)   # (page,)
        kz = kp_ref[0, 0, 1, :].astype(jnp.float32)

        raw = (jnp.dot(q_lo, k_lo, preferred_element_type=jnp.float32)
               + jnp.dot(q_hi, k_hi, preferred_element_type=jnp.float32))
        logits = raw * ks[None, :] - qsum * kz[None, :]

        pos = base + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(pos < length, logits, MASK_VALUE)

        m_prev = m_ref[...][:, 0:1]                   # (Gp, 1)
        m_cur = jnp.max(logits, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        prob = jnp.exp(logits - m_new)                # (Gp, page) f32
        l_new = alpha * l_ref[...][:, 0:1] + jnp.sum(prob, axis=1,
                                                     keepdims=True)

        v_lo, v_hi = _unpack_u4_bf16(vq_ref[0, 0])    # (D/2, page)
        vs = vp_ref[0, 0, 0, :].astype(jnp.float32)
        vz = vp_ref[0, 0, 1, :].astype(jnp.float32)

        ps = (prob * vs[None, :]).astype(jnp.bfloat16)
        pz = jnp.sum(prob * vz[None, :], axis=1, keepdims=True)
        t_lo = jax.lax.dot_general(
            ps, v_lo, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (Gp, D/2)
        t_hi = jax.lax.dot_general(
            ps, v_hi, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        acc_ref[:, :dh] = acc_ref[:, :dh] * alpha + t_lo - pz
        acc_ref[:, dh:] = acc_ref[:, dh:] * alpha + t_hi - pz
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(p == npages - 1)
    def _():
        out_ref[0, 0] = (acc_ref[...] /
                         l_ref[...][:, 0:1]).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "interpret"))
def int4_paged_decode_attention(q, kq, kp, vq, vp, page_table, lengths, *,
                                sm_scale=None, interpret: bool | None = None):
    """One decode step of attention against the paged INT4 pool.

    q:          (B, Hq, D) — already within-head Hadamard-rotated like K.
    kq/vq:      uint8 (P, Hkv, D/2, page) page pools.
    kp/vp:      f32 (P, Hkv, 2, page) scale/zero pools.
    page_table: (B, NP) int32 pool page ids; padding entries must be valid
                ids (masked by lengths).
    lengths:    (B,) int32 valid token counts.
    Returns (B, Hq, D) in q.dtype.
    """
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    B, Hq, D = q.shape
    P, Hkv, _, page = kq.shape
    NP = page_table.shape[1]
    G = Hq // Hkv
    Gp = max(8, G)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)

    qg = (q.astype(jnp.float32) * sm_scale).reshape(B, Hkv, G, D)
    if Gp != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # page_table, lengths
        grid=(B, Hkv, NP),
        in_specs=[
            pl.BlockSpec((1, 1, Gp, D), lambda b, h, p, pt, ln: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, D // 2, page),
                         lambda b, h, p, pt, ln: (pt[b, p], h, 0, 0)),
            pl.BlockSpec((1, 1, 2, page),
                         lambda b, h, p, pt, ln: (pt[b, p], h, 0, 0)),
            pl.BlockSpec((1, 1, D // 2, page),
                         lambda b, h, p, pt, ln: (pt[b, p], h, 0, 0)),
            pl.BlockSpec((1, 1, 2, page),
                         lambda b, h, p, pt, ln: (pt[b, p], h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Gp, D),
                               lambda b, h, p, pt, ln: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Gp, 128), jnp.float32),
            pltpu.VMEM((Gp, 128), jnp.float32),
            pltpu.VMEM((Gp, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_paged_decode_kernel, page=page, npages=NP),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), q.dtype),
        interpret=interpret,
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32),
      qg, kq, kp, vq, vp)
    return out[:, :, :G, :].reshape(B, Hq, D)


def _paged_decode_kernel_stk(lyr_ref, ptab_ref, len_ref, q_ref, kq_ref,
                             kp_ref, vq_ref, vp_ref, out_ref, m_ref, l_ref,
                             acc_ref, *, page, npages):
    """Stacked twin of _paged_decode_kernel: pool blocks come from the FULL
    (L, P, ...) pool selected by the prefetched layer index, so the decode
    layer loop never slices (= copies) the pool per layer (ADVICE r2 #5)."""
    _paged_decode_kernel(ptab_ref, len_ref, q_ref, kq_ref.at[0], kp_ref.at[0],
                         vq_ref.at[0], vp_ref.at[0], out_ref, m_ref, l_ref,
                         acc_ref, page=page, npages=npages)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "interpret"))
def int4_paged_decode_attention_stacked(q, kq_all, kp_all, vq_all, vp_all,
                                        layer, page_table, lengths, *,
                                        sm_scale=None,
                                        interpret: bool | None = None):
    """int4_paged_decode_attention against layer `layer` of the stacked pool
    (L, P, Hkv, D/2, page) without slicing it."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    B, Hq, D = q.shape
    L, P, Hkv, _, page = kq_all.shape
    NP = page_table.shape[1]
    G = Hq // Hkv
    Gp = max(8, G)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)

    qg = (q.astype(jnp.float32) * sm_scale).reshape(B, Hkv, G, D)
    if Gp != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # layer, page_table, lengths
        grid=(B, Hkv, NP),
        in_specs=[
            pl.BlockSpec((1, 1, Gp, D),
                         lambda b, h, p, ly, pt, ln: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, D // 2, page),
                         lambda b, h, p, ly, pt, ln: (ly[0], pt[b, p], h, 0, 0)),
            pl.BlockSpec((1, 1, 1, 2, page),
                         lambda b, h, p, ly, pt, ln: (ly[0], pt[b, p], h, 0, 0)),
            pl.BlockSpec((1, 1, 1, D // 2, page),
                         lambda b, h, p, ly, pt, ln: (ly[0], pt[b, p], h, 0, 0)),
            pl.BlockSpec((1, 1, 1, 2, page),
                         lambda b, h, p, ly, pt, ln: (ly[0], pt[b, p], h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Gp, D),
                               lambda b, h, p, ly, pt, ln: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Gp, 128), jnp.float32),
            pltpu.VMEM((Gp, 128), jnp.float32),
            pltpu.VMEM((Gp, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_paged_decode_kernel_stk, page=page, npages=NP),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), q.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), page_table.astype(jnp.int32),
      lengths.astype(jnp.int32), qg, kq_all, kp_all, vq_all, vp_all)
    return out[:, :, :G, :].reshape(B, Hq, D)


def int4_paged_decode_attention_reference(q, kq, kp, vq, vp, page_table,
                                          lengths, sm_scale=None):
    """Pure-jnp oracle: gather the table's pages into a contiguous
    lane-major cache and run the contiguous oracle."""
    from rsq_tpu.kernels.kv_cache import int4_decode_attention_reference

    def gather(pool):  # (P, Hkv, x, page) -> (B, Hkv, x, NP*page)
        g = pool[page_table]                     # (B, NP, Hkv, x, page)
        g = jnp.moveaxis(g, 1, -2)               # (B, Hkv, x, NP, page)
        return g.reshape(*g.shape[:-2], -1)

    return int4_decode_attention_reference(
        q, gather(kq), gather(kp), gather(vq), gather(vp), lengths,
        sm_scale=sm_scale)


# ---------------------------------------------------------------------------
# Pool initialisation / append paths (jnp; appends are dynamic_update_slice)
# ---------------------------------------------------------------------------

def init_pool(num_layers: int, num_pages: int, num_kv_heads: int,
              head_dim: int, page_size: int):
    """Global page pool shared by every sequence. Layout (L, P, ...) so the
    same page id addresses all layers of a token range (the reference packs
    layers inside each page, page.cuh:19 — same idea, scan-friendly axis
    order)."""
    L, P, H, D, pg = num_layers, num_pages, num_kv_heads, head_dim, page_size
    return {
        "kq": jnp.zeros((L, P, H, D // 2, pg), jnp.uint8),
        "kp": jnp.ones((L, P, H, 2, pg), jnp.float32),
        "vq": jnp.zeros((L, P, H, D // 2, pg), jnp.uint8),
        "vp": jnp.ones((L, P, H, 2, pg), jnp.float32),
    }


def write_prompt_pages(pool_slice, page_ids, kq, kp, vq, vp):
    """Write a whole prompt into its pages (one layer's pool slice).

    pool_slice: dict of (P, Hkv, x, page) arrays.
    page_ids:   (NPROMPT,) int32 — traced OK; NPROMPT static.
    kq/vq:      (Hkv, D/2, S), kp/vp: (Hkv, 2, S) lane-major quantized
                prompt K/V with S == NPROMPT * page (pad the prompt first).
    """
    page = pool_slice["kq"].shape[-1]
    nprompt = page_ids.shape[0]
    z = jnp.int32(0)

    def split(v):  # (H, x, S) -> list of (1, H, x, page)
        H, X, S = v.shape
        assert S == nprompt * page, (S, nprompt, page)
        v = v.reshape(H, X, nprompt, page)
        return jnp.moveaxis(v, 2, 0)[:, None]    # (nprompt, 1, H, x, page)

    vals = {"kq": split(kq), "kp": split(kp), "vq": split(vq),
            "vp": split(vp)}
    out = dict(pool_slice)
    for name, chunks in vals.items():
        arr = out[name]
        for j in range(nprompt):
            arr = jax.lax.dynamic_update_slice(
                arr, chunks[j].astype(arr.dtype),
                (page_ids[j].astype(jnp.int32), z, z, z))
        out[name] = arr
    return out


def append_token_pages(pool_slice, page_table, positions, kq, kp, vq, vp):
    """Append ONE token per slot at its own position (decode step).

    page_table: (B, NP) int32; positions: (B,) int32 write offsets.
    kq/vq: (B, Hkv, D/2, 1); kp/vp: (B, Hkv, 2, 1) lane-major.
    """
    page = pool_slice["kq"].shape[-1]
    B = positions.shape[0]
    z = jnp.int32(0)
    out = dict(pool_slice)
    for name, val in (("kq", kq), ("kp", kp), ("vq", vq), ("vp", vp)):
        arr = out[name]
        for b in range(B):
            pos = positions[b].astype(jnp.int32)
            pid = page_table[b, pos // page].astype(jnp.int32)
            off = pos % page
            arr = jax.lax.dynamic_update_slice(
                arr, val[b:b + 1].astype(arr.dtype), (pid, z, z, off))
        out[name] = arr
    return out


def gather_prefix(pool_slice, page_ids):
    """Dequantize `page_ids` pages back to f32 K/V for chunked prefill
    (tail tokens attending to a cached prefix).

    Returns (k, v) each (Hkv, NPREFIX*page, D) — K still carries the
    per-head Hadamard rotation it was cached with.
    """
    def grab(q_name, p_name):
        qv = pool_slice[q_name][page_ids]        # (NP, H, D/2, page)
        pv = pool_slice[p_name][page_ids]        # (NP, H, 2, page)
        qv = jnp.moveaxis(qv, 0, -2)             # (H, D/2, NP, page)
        pv = jnp.moveaxis(pv, 0, -2)
        qv = qv.reshape(*qv.shape[:-2], -1)      # (H, D/2, S)
        pv = pv.reshape(*pv.shape[:-2], -1)
        return unpack_dequant_head(jnp.swapaxes(qv, -1, -2),
                                   jnp.swapaxes(pv, -1, -2))  # (H, S, D)
    return grab("kq", "kp"), grab("vq", "vp")


def quantize_prompt(k_bhsd, hadamard: bool):
    """(B=1, H, S, D) post-rope K or V -> lane-major quantized pair.
    Set hadamard=True for K (matches the cache contract)."""
    from rsq_tpu.core.hadamard import hadamard_transform_last
    if hadamard:
        k_bhsd = hadamard_transform_last(k_bhsd)
    return to_lane_major(*asym_quant_pack_head(k_bhsd))
