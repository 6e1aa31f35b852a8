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
    MASK_VALUE, _attend_tile, _self_fold_finalize,
    asym_quant_pack_head, to_lane_major, unpack_dequant_head)


# ---------------------------------------------------------------------------
# Decode kernels.  Grid (B, ceil(NP/gp)); the page pools stay in HBM
# (memory_space=ANY) and each grid step MANUALLY DMAs a GROUP of gp pages
# (~512 tokens, all kv heads) into double-buffered VMEM scratch — the
# next work item's pages prefetch while the current group computes (the
# jax public paged_attention kernel's chain, jax/experimental/pallas/ops/
# tpu/paged_attention/paged_attention_kernel.py, adapted to this pool's
# lane-major INT4 layout).  One wide (gp*page)-lane online-softmax tile
# per step — the same cell shape as the contiguous stacked kernel; the
# tile math is shared verbatim (kv_cache._attend_tile).  The
# one-page-per-BlockSpec-step grid this file ran through round 4
# dispatched 64 steps at B=8 NP=8 page=128 and measured 63 us/layer vs
# the contiguous kernel's 29 (trace r5): per-step grid overhead
# (~0.65 us, BENCHMARKS §3) and the narrow 128-lane QK dot both amortize
# over the group.  Lengths-driven skipping is exact: dead groups and
# zero-length rows issue no DMAs and no compute.
# ---------------------------------------------------------------------------

def pick_page_group(NP: int, page: int, target: int = 512) -> int:
    """Pages per compute block: ~target tokens per grid step, capped at 8
    pages (VMEM headroom) and at the table width."""
    return max(1, min(target // max(page, 1), 8, NP))


def _next_work(idx_ref, b, i, *, B, bk):
    """Next real (row, group) work item after (b, i) — the prefetch target
    for the double-buffered DMA chain (the pattern of jax's public
    paged_attention kernel, jax/experimental/pallas/ops/tpu/
    paged_attention/paged_attention_kernel.py): advance the group within
    the row while it still covers cached tokens, else to the first group
    of the next row with a nonzero length (row == B when no work
    remains)."""

    def adv_b():
        nb = b + 1
        nb = jax.lax.fori_loop(
            0, B, lambda _, x: jnp.where(
                (x < B) & (idx_ref[1 + jnp.minimum(x, B - 1)] == 0),
                x + 1, x), nb)
        return nb, jnp.int32(0)

    return jax.lax.cond((i + 1) * bk < idx_ref[1 + b],
                        lambda: (b, jnp.int32(i + 1)), adv_b)


def _group_copies(idx_ref, ptab_ref, kq_hbm, kp_hbm, vq_hbm, vp_hbm,
                  kbuf, kpbuf, vbuf, vpbuf, sems, bb, ii, slot, *,
                  page, gp, B):
    """The 4*gp async page copies loading work item (bb, ii) into buffer
    `slot`: group member j covers table slot ii*gp+j, clamped to the
    row's last valid page (a repeated DMA of that page is cheap and its
    repeated positions are length-masked in the tile).  Each member lands
    in lane window [j*page, (j+1)*page) of its buffer, so the loaded
    group is (Hkv, x, gp*page) with global positions in lane order — the
    (Hkv*x, gp*page) tile view is a free sublane reshape, no in-kernel
    relayout."""
    bs = jnp.minimum(bb, B - 1)
    lb = idx_ref[1 + bs]
    last = jnp.maximum((lb + page - 1) // page - 1, 0)
    layer = idx_ref[0]
    out = []
    for j in range(gp):
        pid = ptab_ref[bs, jnp.minimum(ii * gp + j, last)]
        for t, (hbm, buf) in enumerate(
                ((kq_hbm, kbuf), (kp_hbm, kpbuf),
                 (vq_hbm, vbuf), (vp_hbm, vpbuf))):
            out.append(pltpu.make_async_copy(
                hbm.at[layer, pid],
                buf.at[slot, :, :, pl.ds(j * page, page)],
                sems.at[slot, t]))
    return out


def _paged_dma_attend(idx_ref, ptab_ref, bidx_ref, init_ref, q_all,
                      kq_hbm, kp_hbm, vq_hbm, vp_hbm, kbuf, kpbuf, vbuf,
                      vpbuf, sems, m_ref, l_ref, acc_ref, *, page, gp,
                      npg, B, heads, int8_qk=False):
    """Shared manual-DMA attention body of the paged decode kernels.

    Grid (B, ceil(NP/gp)); the page pools stay in HBM (memory_space=ANY)
    and each real work item's gp pages are copied into double-buffered
    VMEM scratch while the previous group computes — one wide
    (gp*page)-lane _attend_tile per grid step, the same cell shape as the
    contiguous stacked kernel.  BlockSpec-pipelined page groups were
    tried first (one operand per group member) and measured WORSE than
    the one-page grid (101 vs 80 us/layer read-only; the aliased fused
    variant pathologically copied the f32 scale pools per layer) — the
    manual chain keeps one operand per pool and prefetches across row
    boundaries, skipping dead groups exactly (lengths-driven, not
    grid-driven).  Steps whose group is beyond the row's fill do nothing;
    zero-length rows are skipped entirely (the init at i==0 still runs so
    finalizers see a defined state)."""
    b, i = pl.program_id(0), pl.program_id(1)
    length = idx_ref[1 + b]
    bk = gp * page

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def copies(bb, ii, slot):
        return _group_copies(idx_ref, ptab_ref, kq_hbm, kp_hbm, vq_hbm,
                             vp_hbm, kbuf, kpbuf, vbuf, vpbuf, sems,
                             bb, ii, slot, page=page, gp=gp, B=B)

    @pl.when(i * bk < length)
    def _():
        init_flag = init_ref[0]
        init_ref[0] = 0
        slot = bidx_ref[0]
        nb, ni = _next_work(idx_ref, b, i, B=B, bk=bk)

        @pl.when(init_flag == 1)
        def _():  # very first real work item: nothing was prefetched yet
            for c in copies(b, i, slot):
                c.start()

        @pl.when(nb < B)
        def _():  # overlap the next work item's pages with this compute
            for c in copies(nb, ni, 1 - slot):
                c.start()
            bidx_ref[0] = 1 - slot

        for c in copies(b, i, slot):
            c.wait()
        H = heads
        D2 = kbuf.shape[2]
        ch = gp * page
        _attend_tile(q_all(), kbuf[slot].reshape(H * D2, ch), kpbuf[slot],
                     vbuf[slot].reshape(H * D2, ch), vpbuf[slot],
                     i * bk, length, m_ref, l_ref, acc_ref, heads=H,
                     int8_qk=int8_qk)


def _fin_cond(idx_ref, *, bk, npg):
    """Finalize at the row's LAST REAL group (not the last grid step):
    steps past the fill then do zero work — at fill 512 of max_seq 1024
    that halves the executed steps.  Zero-length rows have no real group,
    so they finalize at the final grid step (scratch was initialized at
    i == 0; the self-fold variants still emit the self term).  The output
    block's index map is constant per row, so pallas flushes whatever the
    finalize wrote when the row ends, whichever step wrote it."""
    b, i = pl.program_id(0), pl.program_id(1)
    length = idx_ref[1 + b]
    last_real = (i * bk < length) & ((i + 1) * bk >= length)
    return last_real | ((length == 0) & (i == npg - 1))


def _paged_kernel_fast(idx_ref, ptab_ref, bidx_ref, init_ref, q_ref,
                       kq_hbm, kp_hbm, vq_hbm, vp_hbm, out_ref, kbuf,
                       kpbuf, vbuf, vpbuf, sems, m_ref, l_ref, acc_ref,
                       *, page, gp, npg, B, heads, int8_qk=False):
    _paged_dma_attend(idx_ref, ptab_ref, bidx_ref, init_ref,
                      lambda: q_ref[0].astype(jnp.float32),
                      kq_hbm, kp_hbm, vq_hbm, vp_hbm, kbuf, kpbuf, vbuf,
                      vpbuf, sems, m_ref, l_ref, acc_ref, page=page,
                      gp=gp, npg=npg, B=B, heads=heads, int8_qk=int8_qk)

    @pl.when(_fin_cond(idx_ref, bk=gp * page, npg=npg))
    def _():
        out_ref[0] = (acc_ref[...] /
                      l_ref[...][:, :, 0:1]).astype(out_ref.dtype)


def _paged_kernel_fast_self(idx_ref, ptab_ref, bidx_ref, init_ref, q_ref,
                            kq_hbm, kp_hbm, vq_hbm, vp_hbm, ks_ref,
                            vs_ref, out_ref, kbuf, kpbuf, vbuf, vpbuf,
                            sems, m_ref, l_ref, acc_ref, *, page, gp,
                            npg, B, heads, int8_qk=False):
    """Self-folding twin (kv_cache._decode_kernel_pref_self): the CURRENT
    token's dequantized (k_self, v_self) joins as one more online-softmax
    step in the finalize, so the kernel only ever READS the pool and the
    caller's append can stay in place."""
    _paged_dma_attend(idx_ref, ptab_ref, bidx_ref, init_ref,
                      lambda: q_ref[0].astype(jnp.float32),
                      kq_hbm, kp_hbm, vq_hbm, vp_hbm, kbuf, kpbuf, vbuf,
                      vpbuf, sems, m_ref, l_ref, acc_ref, page=page,
                      gp=gp, npg=npg, B=B, heads=heads, int8_qk=int8_qk)

    @pl.when(_fin_cond(idx_ref, bk=gp * page, npg=npg))
    def _():
        _self_fold_finalize(q_ref[0].astype(jnp.float32),
                            ks_ref[0].astype(jnp.float32),
                            vs_ref[0].astype(jnp.float32),
                            out_ref, m_ref, l_ref, acc_ref)


def _paged_scratch(Hkv, D, ch, Gp, kp_dtype):
    return [
        pltpu.VMEM((2, Hkv, D // 2, ch), jnp.uint8),
        pltpu.VMEM((2, Hkv, 2, ch), kp_dtype),
        pltpu.VMEM((2, Hkv, D // 2, ch), jnp.uint8),
        pltpu.VMEM((2, Hkv, 2, ch), kp_dtype),
        pltpu.SemaphoreType.DMA((2, 4)),
        pltpu.VMEM((Hkv, Gp, 128), jnp.float32),
        pltpu.VMEM((Hkv, Gp, 128), jnp.float32),
        pltpu.VMEM((Hkv, Gp, D), jnp.float32),
    ]


def _paged_q_prep(q, Hkv, sm_scale):
    B, Hq, D = q.shape
    G = Hq // Hkv
    Gp = max(8, G)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    qg = (q.astype(jnp.float32) * sm_scale).reshape(B, Hkv, G, D)
    if Gp != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    return qg, G, Gp


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

    Delegates to the stacked kernel over an L=1 view ([None] is free).
    """
    return int4_paged_decode_attention_stacked(
        q, kq[None], kp[None], vq[None], vp[None], 0, page_table, lengths,
        sm_scale=sm_scale, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "int8_qk", "interpret"))
def int4_paged_decode_attention_stacked(q, kq_all, kp_all, vq_all, vp_all,
                                        layer, page_table, lengths, *,
                                        sm_scale=None,
                                        int8_qk: bool = False,
                                        interpret: bool | None = None):
    """int4_paged_decode_attention against layer `layer` of the stacked pool
    (L, P, Hkv, D/2, page) without slicing it (layer rides scalar
    prefetch)."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    B, Hq, D = q.shape
    L, P, Hkv, _, page = kq_all.shape
    NP = page_table.shape[1]
    gp = pick_page_group(NP, page)
    npg = -(-NP // gp)
    qg, G, Gp = _paged_q_prep(q, Hkv, sm_scale)

    qspec = pl.BlockSpec((1, Hkv, Gp, D), lambda b, p, *_: (b, 0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_paged_kernel_fast, page=page, gp=gp, npg=npg,
                          B=B, heads=Hkv, int8_qk=int8_qk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, npg),
            in_specs=[qspec] + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=qspec,
            scratch_shapes=_paged_scratch(Hkv, D, gp * page, Gp,
                                          kp_all.dtype),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), q.dtype),
        interpret=interpret,
    )(jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                       lengths.astype(jnp.int32)]),
      page_table.astype(jnp.int32),
      jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32),
      qg, kq_all, kp_all, vq_all, vp_all)
    return out[:, :, :G, :].reshape(B, Hq, D)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "int8_qk", "interpret"))
def int4_paged_decode_attention_stacked_self(q, kq_all, kp_all, vq_all,
                                             vp_all, layer, page_table,
                                             lengths, k_self, v_self, *,
                                             sm_scale=None,
                                             int8_qk: bool = False,
                                             interpret: bool | None = None):
    """Stacked paged decode with the CURRENT token's self-attention folded
    in-kernel.  lengths counts CACHED tokens (the new token is NOT in the
    pool yet); k_self/v_self: (B, Hkv, D) dequantized cache-basis values of
    the token being appended.  Returns (B, Hq, D)."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    B, Hq, D = q.shape
    L, P, Hkv, _, page = kq_all.shape
    NP = page_table.shape[1]
    gp = pick_page_group(NP, page)
    npg = -(-NP // gp)
    qg, G, Gp = _paged_q_prep(q, Hkv, sm_scale)

    qspec = pl.BlockSpec((1, Hkv, Gp, D), lambda b, p, *_: (b, 0, 0, 0))
    sspec = pl.BlockSpec((1, Hkv, D), lambda b, p, *_: (b, 0, 0))
    out = pl.pallas_call(
        functools.partial(_paged_kernel_fast_self, page=page, gp=gp,
                          npg=npg, B=B, heads=Hkv, int8_qk=int8_qk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, npg),
            in_specs=([qspec] + [pl.BlockSpec(memory_space=pl.ANY)] * 4
                      + [sspec, sspec]),
            out_specs=qspec,
            scratch_shapes=_paged_scratch(Hkv, D, gp * page, Gp,
                                          kp_all.dtype),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), q.dtype),
        interpret=interpret,
    )(jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                       lengths.astype(jnp.int32)]),
      page_table.astype(jnp.int32),
      jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32),
      qg, kq_all, kp_all, vq_all, vp_all,
      k_self.astype(jnp.float32), v_self.astype(jnp.float32))
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
# Fused attention + append (single kernel per layer per step)
# ---------------------------------------------------------------------------

def _paged_kernel_self_append(idx_ref, ptab_ref, bidx_ref, init_ref,
                              q_ref, kq_hbm, kp_hbm, vq_hbm, vp_hbm,
                              ks_ref, vs_ref, nkq_ref, nkp_ref, nvq_ref,
                              nvp_ref, *rest, page, gp, npg, B, heads,
                              mix=False, G=None, int8_qk=False):
    """Self-folding paged decode that ALSO appends the new token, in ONE
    kernel.  The WRITE page (ptab[b, lengths[b] // page], possibly
    partially filled) is staged into dedicated VMEM scratch by an async
    copy started at the row's first grid step and waited at its finalize
    — it cannot come from the attention double-buffer, whose slot may
    already hold the NEXT row's prefetched group when the row's final
    grid steps are length-skipped.  The updated page flushes as an
    aliased full-page output block, so the separate append kernel (one
    more dispatch per layer per step, 0.2 ms/step measured r3)
    disappears.  When the append opens a FRESH page (pos % page == 0) the
    flushed block's other lanes carry stale content — harmless: every
    read masks by `lengths`, and future appends overwrite the lanes in
    order.

    nk*/nv* are the new token's lane-major quantized values broadcast to
    128 lanes; out*_ref are full-page blocks at the WRITE page, flushed
    once per batch row."""
    (out_ref, okq_ref, okp_ref, ovq_ref, ovp_ref, kbuf, kpbuf, vbuf,
     vpbuf, sems, wkq, wkp, wvq, wvp, wsems, m_ref, l_ref,
     acc_ref) = rest
    b, i = pl.program_id(0), pl.program_id(1)
    length = idx_ref[1 + b]
    layer = idx_ref[0]

    def wcopies():
        wpid = ptab_ref[b, length // page]
        wlane = ((length % page) // 128) * 128
        return [pltpu.make_async_copy(
                    h.at[layer, wpid, :, :, pl.ds(wlane, 128)], w,
                    wsems.at[t])
                for t, (h, w) in enumerate(
                    ((kq_hbm, wkq), (kp_hbm, wkp),
                     (vq_hbm, wvq), (vp_hbm, wvp)))]

    @pl.when(i == 0)
    def _():  # stage the write page for the append flush at row end
        for c in wcopies():
            c.start()

    _paged_dma_attend(idx_ref, ptab_ref, bidx_ref, init_ref,
                      lambda: q_ref[0].astype(jnp.float32),
                      kq_hbm, kp_hbm, vq_hbm, vp_hbm, kbuf, kpbuf, vbuf,
                      vpbuf, sems, m_ref, l_ref, acc_ref, page=page,
                      gp=gp, npg=npg, B=B, heads=heads, int8_qk=int8_qk)

    @pl.when(_fin_cond(idx_ref, bk=gp * page, npg=npg))
    def _():
        _self_fold_finalize(q_ref[0].astype(jnp.float32),
                            ks_ref[0].astype(jnp.float32),
                            vs_ref[0].astype(jnp.float32),
                            out_ref, m_ref, l_ref, acc_ref, mix, G)
        for c in wcopies():
            c.wait()
        col = length % 128  # within the staged 128-lane window

        def wr(o_ref, cbuf, n_ref):
            h, x = n_ref.shape[1], n_ref.shape[2]
            lane = jax.lax.broadcasted_iota(jnp.int32, (h, x, 128), 2)
            new = jnp.broadcast_to(n_ref[0, :, :, 0:1], (h, x, 128))
            o_ref[0, 0] = jnp.where(lane == col, new, cbuf[...])

        wr(okq_ref, wkq, nkq_ref)
        wr(okp_ref, wkp, nkp_ref)
        wr(ovq_ref, wvq, nvq_ref)
        wr(ovp_ref, wvp, nvp_ref)


@functools.partial(jax.jit, static_argnames=("sm_scale", "mix_heads",
                                             "flat", "int8_qk",
                                             "interpret"))
def int4_paged_decode_attention_self_append(q, kq_all, kp_all, vq_all,
                                            vp_all, layer, page_table,
                                            lengths, k_self, v_self,
                                            nkq, nkp, nvq, nvp, *,
                                            sm_scale=None,
                                            mix_heads: bool = False,
                                            flat: bool | None = None,
                                            int8_qk: bool = False,
                                            interpret: bool | None = None):
    """Fused self-folding paged decode + in-place pool append.

    lengths counts CACHED tokens; the new token is appended at position
    lengths[b] of each slot (page ptab[b, lengths[b] // page]).
    k_self/v_self: (B, Hkv, D) dequantized cache-basis values (attention
    math); nkq/nvq: (B, Hkv, D/2, 1) lane-major packed values, nkp/nvp:
    (B, Hkv, 2, 1) (cache contents).  Returns
    (out (B, Hq, D), kq', kp', vq', vp').  Pages must hold >= 128 tokens
    (full-page output blocks need lane-aligned pages); use the separate
    paged_append_pool for smaller test pages.

    flat: run all work items in ONE grid step (the flat kernel) instead
    of the (B, npg) grid.  Default: flat when the unrolled work list is
    small (B * npg <= 32 — serving decode shapes); the grid kernel
    remains for large batch x page-count products where unrolling bloats
    the program."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    B, Hq, D = q.shape
    L, P, Hkv, D2, page = kq_all.shape
    NP = page_table.shape[1]
    gp = pick_page_group(NP, page)
    npg = -(-NP // gp)
    qg, G, Gp = _paged_q_prep(q, Hkv, sm_scale)
    if mix_heads:
        from rsq_tpu.core.hadamard import is_pow2
        assert is_pow2(Hq), "fused head mix needs a pow2 head count"
    if flat is None:
        flat = B * npg <= 32
    if flat:
        out, kq2, kp2, vq2, vp2 = _self_append_flat_call(
            qg, kq_all, kp_all, vq_all, vp_all, layer, page_table,
            lengths, k_self, v_self, nkq, nkp, nvq, nvp, page=page, gp=gp,
            npg=npg, B=B, Hkv=Hkv, Gp=Gp, G=G, mix_heads=mix_heads,
            int8_qk=int8_qk, out_dtype=q.dtype, interpret=interpret)
        return out[:, :, :G, :].reshape(B, Hq, D), kq2, kp2, vq2, vp2

    qspec = pl.BlockSpec((1, Hkv, Gp, D), lambda b, p, *_: (b, 0, 0, 0))
    sspec = pl.BlockSpec((1, Hkv, D), lambda b, p, *_: (b, 0, 0))

    def wspec(x):
        # the 128-lane WINDOW of the write page holding the append column,
        # constant within a batch row (flushed at row end).  A full-page
        # window at page 512 moved ~17 MB/layer of staging+flush traffic
        # (~0.5 ms/step at B=8, measured r5); the window caps it at the
        # page-128 cost regardless of page size.
        return pl.BlockSpec(
            (1, 1, Hkv, x, 128),
            lambda b, p, idx, ptab, bi, fl, x=x: (
                idx[0], ptab[b, idx[1 + b] // page], 0, 0,
                (idx[1 + b] % page) // 128))

    def nblk(x):
        return pl.BlockSpec((1, Hkv, x, 128),
                            lambda b, p, *_: (b, 0, 0, 0))

    def bcast(v, dt):
        return jnp.broadcast_to(v.astype(dt), (*v.shape[:-1], 128))

    in_specs = ([qspec] + [pl.BlockSpec(memory_space=pl.ANY)] * 4
                + [sspec, sspec, nblk(D2), nblk(2), nblk(D2), nblk(2)])
    if mix_heads:
        from rsq_tpu.core.hadamard import is_pow2
        assert is_pow2(Hq), "fused head mix needs a pow2 head count"
    scratch = _paged_scratch(Hkv, D, gp * page, Gp, kp_all.dtype)
    # write-page staging buffers + their semaphores slot in BEFORE the
    # m/l/acc accumulators (kernel signature order)
    scratch = scratch[:5] + [
        pltpu.VMEM((Hkv, D2, 128), kq_all.dtype),
        pltpu.VMEM((Hkv, 2, 128), kp_all.dtype),
        pltpu.VMEM((Hkv, D2, 128), vq_all.dtype),
        pltpu.VMEM((Hkv, 2, 128), vp_all.dtype),
        pltpu.SemaphoreType.DMA((4,)),
    ] + scratch[5:]

    # operand indices incl. the 4 scalar-prefetch args: idx=0, ptab=1,
    # bidx=2, init=3, q=4, pools kq/kp/vq/vp = 5..8 -> outputs 1..4
    out, kq2, kp2, vq2, vp2 = pl.pallas_call(
        functools.partial(_paged_kernel_self_append, page=page, gp=gp,
                          npg=npg, B=B, heads=Hkv, mix=mix_heads, G=G,
                          int8_qk=int8_qk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, npg),
            in_specs=in_specs,
            out_specs=[qspec, wspec(D2), wspec(2), wspec(D2), wspec(2)],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, Gp, D), q.dtype),
            jax.ShapeDtypeStruct(kq_all.shape, kq_all.dtype),
            jax.ShapeDtypeStruct(kp_all.shape, kp_all.dtype),
            jax.ShapeDtypeStruct(vq_all.shape, vq_all.dtype),
            jax.ShapeDtypeStruct(vp_all.shape, vp_all.dtype),
        ],
        input_output_aliases={5: 1, 6: 2, 7: 3, 8: 4},
        interpret=interpret,
    )(jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                       lengths.astype(jnp.int32)]),
      page_table.astype(jnp.int32),
      jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32),
      qg, kq_all, kp_all, vq_all, vp_all,
      k_self.astype(jnp.float32), v_self.astype(jnp.float32),
      bcast(nkq, kq_all.dtype), bcast(nkp, kp_all.dtype),
      bcast(nvq, vq_all.dtype), bcast(nvp, vp_all.dtype))
    return out[:, :, :G, :].reshape(B, Hq, D), kq2, kp2, vq2, vp2


def _paged_kernel_self_append_flat(idx_ref, ptab_ref, qg_ref, kq_hbm,
                                   kp_hbm, vq_hbm, vp_hbm, ks_ref, vs_ref,
                                   nkq_ref, nkp_ref, nvq_ref, nvp_ref,
                                   out_ref, okq_ref, okp_ref, ovq_ref,
                                   ovp_ref, kbuf, kpbuf, vbuf, vpbuf, sems,
                                   wkq, wkp, wvq, wvp, wsems, sstate,
                                   m_ref, l_ref, acc_ref, *, page, gp, npg,
                                   B, heads, mix, G, int8_qk=False):
    """Single-grid-step ("flat") twin of _paged_kernel_self_append: ALL
    B x npg work items run inside ONE grid step as an unrolled loop, so
    the per-grid-step dispatch (~0.65 us, BENCHMARKS §3) is paid once per
    layer instead of B*npg times — at the headline shape (B=8, page 512,
    fill 512) HALF the old (B, npg) grid's steps were past the fill and
    did nothing but still dispatched (measured ~38.6 us/layer total,
    trace r5; the real work floor is ~25 us).  The manual DMA chain is
    unchanged: the same double-buffered page-group copies with
    lengths-driven exact skipping (`_next_work`), the same _attend_tile
    body.  What changes structurally:
    - the per-row (m, l, acc) scratch is REUSED across rows (items run
      in row-major order, each row's state resets at its first group);
    - the pool writes go out as manual async copies at each row's
      finalize (drained before the kernel returns) instead of aliased
      BlockSpec window flushes — the pool OUTPUTS are ANY-space refs;
    - the DMA slot / first-item flags live in SMEM scratch (`sstate`)
      rather than abused scalar-prefetch operands."""
    bk = gp * page
    layer = idx_ref[0]
    sstate[0] = 0  # current double-buffer slot
    sstate[1] = 1  # nothing prefetched yet

    def wcopies(b, out_dir):
        length = idx_ref[1 + b]
        wpid = ptab_ref[b, length // page]
        wlane = ((length % page) // 128) * 128
        pairs = ((okq_ref if out_dir else kq_hbm, wkq),
                 (okp_ref if out_dir else kp_hbm, wkp),
                 (ovq_ref if out_dir else vq_hbm, wvq),
                 (ovp_ref if out_dir else vp_hbm, wvp))
        cs = []
        for t, (hbm, wb) in enumerate(pairs):
            win = hbm.at[layer, wpid, :, :, pl.ds(wlane, 128)]
            src, dst = (wb.at[b], win) if out_dir else (win, wb.at[b])
            cs.append(pltpu.make_async_copy(src, dst, wsems.at[b, t]))
        return cs

    # stage every row's append window up front: 4*B small (128-lane)
    # copies that ride under the attention page-group chain.  Rows
    # sharing a write page (inactive rows on one scratch page) race only
    # on garbage lanes that every reader masks by `lengths`.
    for b in range(B):
        for c in wcopies(b, False):
            c.start()

    def copies(bb, ii, slot):
        return _group_copies(idx_ref, ptab_ref, kq_hbm, kp_hbm, vq_hbm,
                             vp_hbm, kbuf, kpbuf, vbuf, vpbuf, sems,
                             bb, ii, slot, page=page, gp=gp, B=B)

    H = heads
    D2 = kbuf.shape[2]
    ch = gp * page
    for w in range(B * npg):
        b, i = divmod(w, npg)
        length = idx_ref[1 + b]
        if i == 0:
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when(i * bk < length)
        def _(b=b, i=i):
            slot = sstate[0]
            first = sstate[1]
            sstate[1] = 0
            nb, ni = _next_work(idx_ref, b, i, B=B, bk=bk)

            @pl.when(first == 1)
            def _():  # very first real item: nothing was prefetched yet
                for c in copies(b, i, slot):
                    c.start()

            @pl.when(nb < B)
            def _():  # overlap the next item's pages with this compute
                for c in copies(nb, ni, 1 - slot):
                    c.start()
                sstate[0] = 1 - slot

            for c in copies(b, i, slot):
                c.wait()
            _attend_tile(qg_ref[b], kbuf[slot].reshape(H * D2, ch),
                         kpbuf[slot], vbuf[slot].reshape(H * D2, ch),
                         vpbuf[slot], i * bk, length, m_ref, l_ref,
                         acc_ref, heads=H, int8_qk=int8_qk)

        last_real = (i * bk < length) & ((i + 1) * bk >= length)

        @pl.when(last_real | ((length == 0) & (i == npg - 1)))
        def _(b=b, length=length):
            _self_fold_finalize(qg_ref[b], ks_ref[b].astype(jnp.float32),
                                vs_ref[b].astype(jnp.float32),
                                out_ref.at[pl.ds(b, 1)], m_ref, l_ref,
                                acc_ref, mix, G)
            for c in wcopies(b, False):
                c.wait()
            col = length % 128

            def wr(wb, n_ref):
                h, x = n_ref.shape[1], n_ref.shape[2]
                lane = jax.lax.broadcasted_iota(jnp.int32, (h, x, 128), 2)
                new = jnp.broadcast_to(n_ref[b, :, :, 0:1], (h, x, 128))
                wb[b] = jnp.where(lane == col, new, wb[b])

            wr(wkq, nkq_ref)
            wr(wkp, nkp_ref)
            wr(wvq, nvq_ref)
            wr(wvp, nvp_ref)
            for c in wcopies(b, True):
                c.start()

    # drain the write-backs: every started DMA must complete before the
    # kernel returns
    for b in range(B):
        for c in wcopies(b, True):
            c.wait()


def _self_append_flat_call(qg, kq_all, kp_all, vq_all, vp_all, layer,
                           page_table, lengths, k_self, v_self, nkq, nkp,
                           nvq, nvp, *, page, gp, npg, B, Hkv, Gp, G,
                           mix_heads, int8_qk, out_dtype, interpret):
    """pallas_call plumbing of the flat fused kernel (grid (1,), ANY-space
    aliased pool outputs, manual write-back DMAs)."""
    L, P, _, D2, _ = kq_all.shape
    D = 2 * D2
    full = pl.BlockSpec((B, Hkv, Gp, D), lambda g, *_: (0, 0, 0, 0))
    sfull = pl.BlockSpec((B, Hkv, D), lambda g, *_: (0, 0, 0))

    def nblk(x):
        return pl.BlockSpec((B, Hkv, x, 128), lambda g, *_: (0, 0, 0, 0))

    def bcast(v, dt):
        return jnp.broadcast_to(v.astype(dt), (*v.shape[:-1], 128))

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((2, Hkv, D2, gp * page), jnp.uint8),
        pltpu.VMEM((2, Hkv, 2, gp * page), kp_all.dtype),
        pltpu.VMEM((2, Hkv, D2, gp * page), jnp.uint8),
        pltpu.VMEM((2, Hkv, 2, gp * page), vp_all.dtype),
        pltpu.SemaphoreType.DMA((2, 4)),
        pltpu.VMEM((B, Hkv, D2, 128), kq_all.dtype),
        pltpu.VMEM((B, Hkv, 2, 128), kp_all.dtype),
        pltpu.VMEM((B, Hkv, D2, 128), vq_all.dtype),
        pltpu.VMEM((B, Hkv, 2, 128), vp_all.dtype),
        pltpu.SemaphoreType.DMA((B, 4)),
        pltpu.SMEM((2,), jnp.int32),
        pltpu.VMEM((Hkv, Gp, 128), jnp.float32),
        pltpu.VMEM((Hkv, Gp, 128), jnp.float32),
        pltpu.VMEM((Hkv, Gp, D), jnp.float32),
    ]
    # operands incl. the 2 scalar-prefetch args: idx=0, ptab=1, qg=2,
    # pools kq/kp/vq/vp = 3..6 -> outputs 1..4
    return pl.pallas_call(
        functools.partial(_paged_kernel_self_append_flat, page=page, gp=gp,
                          npg=npg, B=B, heads=Hkv, mix=mix_heads, G=G,
                          int8_qk=int8_qk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=([full] + [anyspec] * 4 + [sfull, sfull,
                      nblk(D2), nblk(2), nblk(D2), nblk(2)]),
            out_specs=[full, anyspec, anyspec, anyspec, anyspec],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, Gp, D), out_dtype),
            jax.ShapeDtypeStruct(kq_all.shape, kq_all.dtype),
            jax.ShapeDtypeStruct(kp_all.shape, kp_all.dtype),
            jax.ShapeDtypeStruct(vq_all.shape, vq_all.dtype),
            jax.ShapeDtypeStruct(vp_all.shape, vp_all.dtype),
        ],
        input_output_aliases={3: 1, 4: 2, 5: 3, 6: 4},
        interpret=interpret,
    )(jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                       lengths.astype(jnp.int32)]),
      page_table.astype(jnp.int32),
      qg, kq_all, kp_all, vq_all, vp_all,
      k_self.astype(jnp.float32), v_self.astype(jnp.float32),
      bcast(nkq, kq_all.dtype), bcast(nkp, kp_all.dtype),
      bcast(nvq, vq_all.dtype), bcast(nvp, vp_all.dtype))


# ---------------------------------------------------------------------------
# Aliased in-place pool append (decode hot path)
# ---------------------------------------------------------------------------

def _paged_append_kernel(idx_ref, ptab_ref, kqc_ref, kpc_ref, vqc_ref,
                         vpc_ref, nkq_ref, nkp_ref, nvq_ref, nvp_ref,
                         okq_ref, okp_ref, ovq_ref, ovp_ref, *, lane_mod):
    """kv_cache._append_kernel with page-table indirection: the window
    BlockSpecs resolve (page id, lane block) from the prefetched table.
    lane_mod = window width = min(page, 128): the in-window column is
    pos % lane_mod (for page < 128 the window IS the page, so pos % page;
    for page a multiple of 128 the window is the 128-lane block holding
    pos, so pos % 128 — kv_cache._append_kernel's fixed %128 would write
    out of the page for small pages, silently dropping appends)."""
    b = pl.program_id(0)
    col = idx_ref[1 + b] % lane_mod

    def wr(o_ref, c_ref, n_ref):
        h, x, w = n_ref.shape[1:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (h, x, w), 2)
        o_ref[0, 0] = jnp.where(lane == col, n_ref[0], c_ref[0, 0])

    wr(okq_ref, kqc_ref, nkq_ref)
    wr(okp_ref, kpc_ref, nkp_ref)
    wr(ovq_ref, vqc_ref, nvq_ref)
    wr(ovp_ref, vpc_ref, nvp_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_append_pool(kq, kp, vq, vp, layer, page_table, positions,
                      nkq, nkp, nvq, nvp, *, interpret: bool | None = None):
    """Append one token per slot into layer `layer` of the page pool, in
    place (aliased Pallas windows).  Replaces 4 x B dynamic_update_slice ops
    per layer per step (the dispatch pathology measured at 1.5 ms/step on
    the contiguous cache, trace_decode r3).

    kq/vq: (L, P, H, D/2, page) uint8 pools; kp/vp: (L, P, H, 2, page) f32.
    page_table: (B, NP) int32; positions: (B,) int32 write positions —
    the target page is page_table[b, pos // page], lane pos % page.
    Empty slots must point at a scratch page (they overwrite garbage).
    nkq/nvq: (B, H, D/2, 1) lane-major token values; nkp/nvp: (B, H, 2, 1).
    Returns the four updated pool arrays."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    L, P, H, D2, page = kq.shape
    B = positions.shape[0]
    if page >= 128:
        assert page % 128 == 0, "page sizes over 128 must be 128-multiples"
        w = 128
    else:
        w = page  # window = the whole (sub-128-lane) page
    scal = jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                            positions.astype(jnp.int32)])

    def cwin(x):
        return pl.BlockSpec(
            (1, 1, H, x, w),
            lambda b, idx, ptab, x=x: (idx[0],
                                       ptab[b, idx[1 + b] // page],
                                       0, 0, (idx[1 + b] % page) // w))

    def nblk(x):
        return pl.BlockSpec((1, H, x, w), lambda b, idx, ptab: (b, 0, 0, 0))

    def bcast(v, dt):
        # accept both (..., 1) values and decode_prep's pre-broadcast
        # (..., 128) layout (every lane holds the same value)
        if v.shape[-1] >= w:
            return v[..., :w].astype(dt)
        return jnp.broadcast_to(v.astype(dt), (*v.shape[:-1], w))

    return pl.pallas_call(
        functools.partial(_paged_append_kernel, lane_mod=w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[cwin(D2), cwin(2), cwin(D2), cwin(2),
                      nblk(D2), nblk(2), nblk(D2), nblk(2)],
            out_specs=[cwin(D2), cwin(2), cwin(D2), cwin(2)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(kq.shape, kq.dtype),
            jax.ShapeDtypeStruct(kp.shape, kp.dtype),
            jax.ShapeDtypeStruct(vq.shape, vq.dtype),
            jax.ShapeDtypeStruct(vp.shape, vp.dtype),
        ],
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        interpret=interpret,
    )(scal, page_table.astype(jnp.int32), kq, kp, vq, vp,
      bcast(nkq, kq.dtype), bcast(nkp, kp.dtype),
      bcast(nvq, vq.dtype), bcast(nvp, vp.dtype))


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
