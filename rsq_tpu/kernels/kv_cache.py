"""Fused INT4 KV-cache decode attention (Pallas).

TPU counterpart of the reference's FlashInfer-derived CUDA stack
(quarot/kernels/include/flashinfer/decode.cuh:492 `BatchDecodeWithPagedKVCache`,
page.cuh append/init kernels, launchers flashinfer.cu:9-224): one kernel per
decode step performs INT4 dequantization of the KV cache, online-softmax
attention, and GQA head grouping, so the cache is read once at 4
bits/element.

Performance-critical layout decisions (v5e):
- The cache is stored SEQUENCE-IN-LANES:  (B, Hkv, D/2, S) uint8, params
  (B, Hkv, 2, S) f32.  The long S axis maps to the 128-lane dimension and
  D/2 = 64 to sublanes, so every DMA tile is full-width (a (chunk, D/2)
  token-major layout wastes half of each 128-lane int8 tile).
- Zero materialized dequantization: with k_dj = u_dj*s_j - z_j,
      logits_gj = s_j * (q @ u)_gj - z_j * (sum_d q_gd)
      out_gd    = ((p * s_v) @ u_v^T)_gd - sum_j p_gj z_vj
  so the u nibbles go straight into the MXU as bf16 (exact: u <= 15) and the
  scales/zeros fold into rank-1 epilogues.
- Nibble planes (low = d < D/2, high = d >= D/2) are consumed by separate
  dots — no lane interleave or concat anywhere.

The reference restricts batches to equal page counts anyway
(kv_cache.py:265-267), so contiguous per-sequence storage is functionally
equivalent to its page table while keeping all indexing static under jit;
appends are dynamic_update_slice, no scatter kernels needed.

K is Hadamard-rotated per head before quantization and q is rotated at
decode (the within-head H cancels in q.k — kv_cache.py:30-33,111-127).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e30


def _unpack_u4_bf16(packed):
    """uint8 (R, C) -> two bf16 (R, C) UNSIGNED nibble planes in [0, 15].

    Word-packed unpack (see matmul_w4._unpack_block_i8_biased): one mask
    (+ one shift for the high plane) per FOUR bytes in i32, then a single
    i8 -> bf16 convert, instead of widening every byte to i32.  Asym KV
    nibbles are stored unsigned, so no sign fix is needed.  Requires
    R % 4 == 0 (always: R = D/2 >= 32)."""
    w32 = pltpu.bitcast(packed, jnp.int32)
    lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8).astype(jnp.bfloat16)
    hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8).astype(jnp.bfloat16)
    return lo, hi


def _fwht_axis0(y):
    """Unnormalized Walsh-Hadamard butterfly over axis 0 of (n, D) — the
    EXACT add/sub DAG of core.hadamard.fwht (bit-identical f32 results),
    so in-kernel transforms match the XLA-path transforms ulp-for-ulp
    (a4 cascades amplify even ulp asymmetries between code paths)."""
    n, D = y.shape
    h = 1
    while h < n:
        yr = y.reshape(n // (2 * h), 2, h, D)
        a, b = yr[:, 0], yr[:, 1]
        y = jnp.concatenate([a + b, a - b], axis=1).reshape(n, D)
        h *= 2
    return y


def _fwht_lanes(y):
    """fwht over the LAST axis of a 2-D array.  Implemented as
    transpose -> sublane butterfly -> transpose: the direct lane-splitting
    reshapes fail to lower in Mosaic, and the add/sub DAG (hence the f32
    results, bit-for-bit) is unchanged by the layout."""
    return jnp.swapaxes(_fwht_axis0(jnp.swapaxes(y, 0, 1)), 0, 1)


# ---------------------------------------------------------------------------
# Quantize / pack (jnp; used by append paths)
# ---------------------------------------------------------------------------

def asym_quant_pack_head(x):
    """x: (..., D) -> (packed uint8 (..., D/2), params (..., 2) f32).

    Per-(token, head) asymmetric int4 over the head_dim axis, the reference's
    `asym_quantize_and_pack_i4` (kv_cache.py:10-22) with planar nibble
    packing (low nibble = first half of D)."""
    xf = x.astype(jnp.float32)
    xmax = jnp.max(xf, axis=-1, keepdims=True)
    xmin = jnp.min(xf, axis=-1, keepdims=True)
    scale = jnp.clip(xmax - xmin, min=1e-5) / 15.0
    zero = -xmin
    u = jnp.clip(jnp.round((xf + zero) / scale), 0, 15).astype(jnp.uint8)
    d = u.shape[-1]
    packed = (u[..., : d // 2] | (u[..., d // 2:] << 4)).astype(jnp.uint8)
    params = jnp.concatenate([scale, zero], axis=-1)
    return packed, params


def unpack_dequant_head(packed, params):
    """Inverse of asym_quant_pack_head -> f32 (..., D)."""
    lo = (packed & 0x0F).astype(jnp.float32)
    hi = ((packed >> 4) & 0x0F).astype(jnp.float32)
    u = jnp.concatenate([lo, hi], axis=-1)
    scale = params[..., 0:1]
    zero = params[..., 1:2]
    return u * scale - zero


def to_lane_major(packed, params):
    """(B, H, S, D/2)+(B, H, S, 2) -> (B, H, D/2, S)+(B, H, 2, S), the
    kernel's storage layout."""
    return (jnp.swapaxes(packed, -1, -2), jnp.swapaxes(params, -1, -2))


def _decode_prep_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, hm_ref,
                        qh_ref, ks_ref, vs_ref, nkq_ref, nkp_ref,
                        nvq_ref, nvp_ref, *, kv_had):
    B, Hq, D = q_ref.shape
    Hkv = k_ref.shape[1]
    half = D // 2
    cos = cos_ref[...].astype(jnp.float32)[:, None, :]
    sin = sin_ref[...].astype(jnp.float32)[:, None, :]

    # EXACT legacy chain rounding (apply_rope casts back to bf16;
    # hadamard_transform_last computes the butterfly in f32 and casts
    # back) — a4 cascades amplify even ulp asymmetries between paths
    def rope(xr):
        xf = xr[...].astype(jnp.float32)
        rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
        return (xf * cos + rot * sin).astype(xr.dtype).astype(jnp.float32)

    q = rope(q_ref)
    k = rope(k_ref)
    if kv_had:
        # the BUTTERFLY, not a dense MXU dot: bit-identical to the XLA
        # path's fwht, which keeps the near-threshold a4 equivalence
        # margins (TP-vs-single-chip) where the legacy chain had them — a
        # dense dot's different f32 summation order reshuffled enough
        # near-tie int4 codes to decorrelate the tiny-model cascades
        s = 1.0 / math.sqrt(D)

        def had(x):
            sh = x.shape
            y = _fwht_lanes(x.reshape(-1, D)) * s
            return y.astype(jnp.bfloat16).astype(jnp.float32).reshape(sh)

        q = had(q)
        k = had(k)
    qh_ref[...] = q.astype(qh_ref.dtype)
    v = v_ref[...].astype(jnp.float32)

    def qpack(x, s_ref, nq_ref, np_ref):
        xmax = jnp.max(x, axis=-1, keepdims=True)
        xmin = jnp.min(x, axis=-1, keepdims=True)
        scale = jnp.maximum(xmax - xmin, 1e-5) / 15.0
        zero = -xmin
        # all integer work stays in i32 (Mosaic: no f32->u8 cast, and the
        # lane-sliced u8 nibble pack fails to lower); the u8 cast happens
        # once, after the lane broadcast
        ui = jnp.clip(jnp.round((x + zero) / scale), 0, 15
                      ).astype(jnp.int32)
        packed = ui[..., :half] | (ui[..., half:] << 4)
        s_ref[...] = ui.astype(jnp.float32) * scale - zero
        nq_ref[...] = jnp.broadcast_to(
            packed[..., None], (B, Hkv, half, 128)).astype(jnp.uint8)
        np_ref[...] = jnp.broadcast_to(
            jnp.concatenate([scale, zero], axis=-1)[..., None],
            (B, Hkv, 2, 128))

    qpack(k, ks_ref, nkq_ref, nkp_ref)
    qpack(v, vs_ref, nvq_ref, nvp_ref)


@functools.partial(jax.jit, static_argnames=("kv_had", "interpret"))
def decode_prep(q, k, v, cos, sin, *, kv_had: bool = True,
                interpret: bool | None = None):
    """Fused decode-token prep: RoPE(q, k) -> per-head Hadamard(q, k) ->
    asym INT4 quant-pack(k, v) + dequantized self values, in ONE Pallas
    call.  Replaces the ~15 small XLA ops per layer per step (rope
    fusions, hadamard staging, pack/unpack/transpose chains, append
    broadcasts) that made up most of the measured ~0.8 ms/step decode
    layer-loop residue (trace r5).

    q: (B, Hq, D); k/v: (B, Hkv, D); cos/sin: (B, D).
    Returns (qh (B, Hq, D) q.dtype — rotated rope'd q,
             k_self, v_self (B, Hkv, D) f32 — dequantized cache-basis,
             nkq (B, Hkv, D/2, 128) u8, nkp (B, Hkv, 2, 128) f32,
             nvq, nvp) — the n* outputs are pre-broadcast to 128 lanes,
    exactly the nblk layout the fused self-append kernels take (their
    bcast is then a no-op).

    Every transform replicates the legacy XLA chain's exact rounding
    (bf16 round-trips, the same butterfly add DAG) so fused and unfused
    paths agree ulp-for-ulp — a4 cascades amplify any asymmetry."""
    from rsq_tpu.kernels import default_interpret
    from rsq_tpu.core.hadamard import dense_hadamard
    interpret = default_interpret(interpret)
    B, Hq, D = q.shape
    Hkv = k.shape[1]
    hm = (jnp.asarray(dense_hadamard(D), jnp.float32) if kv_had
          else jnp.zeros((D, D), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_decode_prep_kernel, kv_had=kv_had),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, D // 2, 128), jnp.uint8),
            jax.ShapeDtypeStruct((B, Hkv, 2, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, D // 2, 128), jnp.uint8),
            jax.ShapeDtypeStruct((B, Hkv, 2, 128), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, cos.astype(jnp.float32), sin.astype(jnp.float32), hm)
    return tuple(outs)


def pick_chunk(S: int, target: int) -> int:
    """Largest sequence-chunk <= target that DIVIDES S, preferring
    lane-aligned (128-multiple) chunks.  The stacked decode kernel cannot
    pad the cache (padding would copy it — the very thing it exists to
    avoid), so non-chunk-multiple max_seq must adapt the chunk instead of
    asserting (ADVICE r2 #1)."""
    t = min(target, S)
    for c in range(t - t % 128, 0, -128):
        if S % c == 0:
            return c
    for c in range(t, 0, -1):
        if S % c == 0:
            return c
    return S


# ---------------------------------------------------------------------------
# Decode kernel
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("sm_scale", "chunk", "interpret"))
def int4_decode_attention(q, kq, kp, vq, vp, lengths, *, sm_scale=None,
                          chunk: int = 512, interpret: bool | None = None):
    """One decode step of attention against the INT4 cache.

    q: (B, Hq, D) — already within-head Hadamard-rotated to match K.
    kq/vq: uint8 (B, Hkv, D/2, S) lane-major; kp/vp: f32 (B, Hkv, 2, S).
    lengths: (B,) int32 valid token counts.
    Returns (B, Hq, D) in q.dtype.

    Delegates to the stacked kernel over an L=1 view (a [None] reshape is
    free): the all-heads-per-grid-cell stacked grid measured 5.5x faster
    than the per-(B, H, chunk) grid this function previously ran (167 ->
    30 us at B=8 Hkv=8 S=2048, qattention_bench r3) — narrow per-head
    blocks spend ~0.65 us of grid overhead per 0.09 us of DMA.
    """
    out, _, _ = int4_decode_attention_stacked(
        q, kq[None], kp[None], vq[None], vp[None], 0, lengths,
        sm_scale=sm_scale, chunk=chunk, interpret=interpret)
    return out


def _attend_tile(q_all, kq2d, kpb, vq2d, vpb, base, length,
                 m_ref, l_ref, acc_ref, *, heads, int8_qk=False):
    """One online-softmax step over a (H*D/2, ch) packed K/V tile,
    accumulating into the (m, l, acc) scratch.  Takes VALUES (already read
    from whatever blocks hold them — one contiguous chunk, or several
    concatenated pool pages in the paged kernels); `base` is the global
    position of the tile's first token.
    q_all: (H, Gp, D) f32, PRE-scaled by sm_scale;
    kq2d/vq2d: uint8 (H*D/2, ch) lane-major; kpb/vpb: (H, 2, ch) f32.

    int8_qk: run the QK contraction on the int8 MXU path (2x the bf16
    rate on v5e) — q is symmetric-int8 per (head, group) row and the
    UNSIGNED K nibbles (0..15) feed the dot directly: the cache's
    zero-point already folds through the existing rank-1 `kz` epilogue,
    so no bias correction is needed, only the per-row q scale.  q's
    round-trip error (~1/254 per element) is the same order as the bf16
    cast the default path performs; opt-in because it perturbs logits
    enough to reshuffle near-tie INT4 codes in a4 cascades."""
    H = heads
    Gp = q_all.shape[1]
    D2, ch = kq2d.shape[0] // H, kq2d.shape[1]
    D = 2 * D2

    # ---- merged QK dot: ONE (H*Gp, H*D) @ (H*D, ch) block-diagonal
    # matmul instead of H separate (Gp, D) @ (D, ch) dots.  Same MXU
    # flop count (off-diagonal blocks are zero but still multiplied),
    # but M-utilization goes Gp/128 -> H*Gp/128 (6% -> 50% at decode
    # shapes) and one dot amortizes the MXU pipeline latency that
    # dominates small-tile matmuls.  The stacked unpack is free:
    # (H, D/2, ch) reshapes row-major to the (H*D, ch) contraction
    # layout the dot needs.
    col_h = jax.lax.broadcasted_iota(
        jnp.int32, (H * Gp, H * D), 1) // D
    row_h = jax.lax.broadcasted_iota(
        jnp.int32, (H * Gp, H * D), 0) // Gp
    w32 = pltpu.bitcast(kq2d, jnp.int32)
    if int8_qk:
        qflat_f = q_all.reshape(H * Gp, D)
        qmax = jnp.max(jnp.abs(qflat_f), axis=1, keepdims=True)
        qs = jnp.where(qmax == 0, 1.0, qmax / 127.0)  # (H*Gp, 1)
        q_i8 = jnp.clip(jnp.round(qflat_f / qs), -127, 127
                        ).astype(jnp.int8)
        qbd = jnp.where(col_h == row_h, jnp.tile(q_i8, (1, H)), 0)
        k_lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)
        k_hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
        kf = (jnp.concatenate(
            [k_lo.reshape(H, D2, ch), k_hi.reshape(H, D2, ch)], axis=1)
            .reshape(H * D, ch))
        raw = (jnp.dot(qbd, kf, preferred_element_type=jnp.int32)
               .astype(jnp.float32) * qs)
        # the epilogue's zero-point term must use the sum of the q the
        # dot ACTUALLY saw (the int8 round-trip), not the f32 original
        qsum = (jnp.sum(q_i8.astype(jnp.float32), axis=1, keepdims=True)
                * qs).reshape(H, Gp, 1)
    else:
        qsum = jnp.sum(q_all, axis=2, keepdims=True)  # (H, Gp, 1)
        qflat = q_all.reshape(H * Gp, D).astype(jnp.bfloat16)
        qtile = jnp.tile(qflat, (1, H))               # (H*Gp, H*D)
        qbd = jnp.where(col_h == row_h, qtile, 0)
        k_lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8
                             ).astype(jnp.bfloat16)
        k_hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8
                             ).astype(jnp.bfloat16)
        kf = (jnp.concatenate(
            [k_lo.reshape(H, D2, ch), k_hi.reshape(H, D2, ch)], axis=1)
            .reshape(H * D, ch))                      # head-major rows
        raw = jnp.dot(qbd, kf, preferred_element_type=jnp.float32)

    ks = kpb[:, 0:1, :].astype(jnp.float32)           # (H, 1, ch)
    kz = kpb[:, 1:2, :].astype(jnp.float32)
    logits = raw.reshape(H, Gp, ch) * ks - qsum * kz

    pos = base + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    logits = jnp.where(pos < length, logits, MASK_VALUE)

    m_prev = m_ref[...][:, :, 0:1]                    # (H, Gp, 1)
    m_cur = jnp.max(logits, axis=2, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)                       # (H, Gp, ch) f32
    l_new = alpha * l_ref[...][:, :, 0:1] + jnp.sum(p, axis=2,
                                                    keepdims=True)

    v_lo, v_hi = _unpack_u4_bf16(vq2d)
    vs = vpb[:, 0:1, :].astype(jnp.float32)           # (H, 1, ch)
    vz = vpb[:, 1:2, :].astype(jnp.float32)

    # PV stays as H per-head dots: a merged block-diagonal PV (the QK
    # trick) was tried and measured SLOWER end-to-end (9.69 vs
    # 8.83 ms/step, r3) — building the (H*Gp, H*ch) block-diagonal P
    # and transposing V to (D, H*ch) costs more VPU/relayout time than
    # the H small dots' pipeline latency.
    ps = (p * vs).astype(jnp.bfloat16)                # (H, Gp, ch)
    pz = jnp.sum(p * vz, axis=2, keepdims=True)       # (H, Gp, 1)
    ts = []
    for h in range(heads):
        vf = jnp.concatenate(
            [v_lo[h * D2:(h + 1) * D2], v_hi[h * D2:(h + 1) * D2]],
            axis=0)                                   # (D, ch)
        ts.append(jax.lax.dot_general(
            ps[h], vf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))      # (Gp, D)
    t = jnp.stack(ts)

    acc_ref[...] = acc_ref[...] * alpha + t - pz
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)


def _attend_chunks(idx_ref, q_ref, kq_ref, kp_ref, vq_ref, vp_ref,
                   m_ref, l_ref, acc_ref, *, chunk, heads, int8_qk=False):
    """Shared chunk body of the stacked INT4 flash-decode kernels: one
    online-softmax step over this grid cell's (batch, chunk) cache block,
    accumulating into the (m, l, acc) scratch."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    length = idx_ref[1 + pl.program_id(0)]
    base = s * chunk

    @pl.when(base < length)
    def _():
        H = heads
        D2, ch = kq_ref.shape[3], kq_ref.shape[4]
        _attend_tile(q_ref[0].astype(jnp.float32),
                     kq_ref[0, 0].reshape(H * D2, ch),
                     kp_ref[0, 0], vq_ref[0, 0].reshape(H * D2, ch),
                     vp_ref[0, 0], base, length, m_ref, l_ref, acc_ref,
                     heads=heads, int8_qk=int8_qk)


def _decode_kernel_pref(idx_ref, q_ref, kq_ref, kp_ref, vq_ref,
                        vp_ref, out_ref, m_out_ref, l_out_ref, m_ref, l_ref,
                        acc_ref, *, chunk, nchunks, heads, int8_qk=False):
    """Stacked INT4 flash-decode kernel: cache blocks come from the FULL
    stacked (L, B, H, ...) arrays, selected by the prefetched layer index
    (slicing the cache per layer would copy ~9 MB/layer/step).
    idx_ref (scalar prefetch) = [layer, length_0 .. length_{B-1}]; the
    lengths also drive the cache BlockSpec index maps, which CLAMP the
    sequence-chunk index to the last valid chunk — consecutive repeated
    block indices skip the DMA, so a sequence at fill f only streams
    ceil(f/chunk) chunks of its max_seq-sized cache.

    Processes ALL kv heads of one (batch, chunk) cell per grid step — a
    per-(B, H, chunk) grid spends ~0.65 us of grid overhead per 0.09 us of
    DMA (measured 108 GB/s, trace_decode r3); widening the block to the
    whole head axis makes each step stream ~0.6 MB.

    Also emits the online-softmax state (m, l) so the caller can merge the
    CURRENT token's self-attention term analytically — the kernel then only
    ever READS the cache, letting XLA apply the subsequent append scatter
    in place (a scatter racing a custom-call consumer forces a full cache
    copy per layer: ~300 MB, measured as 76 ms of a 90 ms decode step)."""
    _attend_chunks(idx_ref, q_ref, kq_ref, kp_ref, vq_ref, vp_ref,
                   m_ref, l_ref, acc_ref, chunk=chunk, heads=heads,
                   int8_qk=int8_qk)

    @pl.when(pl.program_id(1) == nchunks - 1)
    def _():
        out_ref[0] = (acc_ref[...] /
                      l_ref[...][:, :, 0:1]).astype(out_ref.dtype)
        m_out_ref[0] = m_ref[...]
        l_out_ref[0] = l_ref[...]


def _self_fold_finalize(q_all, ks, vs, out_ref, m_ref, l_ref,
                        acc_ref, mix=False, G=None):
    """Shared finalize of the self-folding decode kernels: one more
    online-softmax step over the CURRENT token's (k_self, v_self), then
    normalize and emit.  Exact — it is the same update the chunk loop runs,
    with a one-column block.

    mix=True: the post-attention head-mixing Hadamard (o_proj's online
    partial Hadamard) fused into the finalize as a butterfly over the
    head axis — the EXACT DAG of head_mixing_hadamard, so single-chip
    (fused) and TP (unfused, all-heads) paths agree ulp-for-ulp.
    Requires pow2 head count (callers gate).  Rows beyond the G real
    groups (Gp padding) emit zeros."""
    # q_all: (H, Gp, D) f32 pre-scaled; ks/vs: (H, D) f32
    lg = jnp.sum(q_all * ks[:, None, :], axis=2, keepdims=True)
    m_prev = m_ref[...][:, :, 0:1]                    # (H, Gp, 1)
    m_fin = jnp.maximum(m_prev, lg)
    alpha = jnp.exp(m_prev - m_fin)                   # 0 if cache empty
    p = jnp.exp(lg - m_fin)                           # (H, Gp, 1)
    l_fin = l_ref[...][:, :, 0:1] * alpha + p
    acc = acc_ref[...] * alpha + p * vs[:, None, :]
    out = acc / l_fin                                 # (H, Gp, D) f32
    if not mix:
        out_ref[0] = out.astype(out_ref.dtype)
        return
    H, Gp, D = out.shape
    # round to the output dtype FIRST: the unfused path mixes the
    # bf16-rounded attention output
    out = out.astype(out_ref.dtype).astype(jnp.float32)
    flat = out[:, :G, :].reshape(H * G, D)
    mixed = (_fwht_axis0(flat) * (1.0 / math.sqrt(H * G))
             ).astype(out_ref.dtype).astype(jnp.float32)
    mixed = mixed.reshape(H, G, D)
    if Gp != G:
        mixed = jnp.concatenate(
            [mixed, jnp.zeros((H, Gp - G, D), jnp.float32)], axis=1)
    out_ref[0] = mixed.astype(out_ref.dtype)


def _decode_kernel_pref_self(idx_ref, q_ref, kq_ref, kp_ref, vq_ref, vp_ref,
                             ks_ref, vs_ref, out_ref, m_ref, l_ref, acc_ref,
                             *, chunk, nchunks, heads, int8_qk=False):
    """_decode_kernel_pref variant that folds the CURRENT token's
    self-attention term in-kernel: ks_ref/vs_ref hold the (1, H, D)
    dequantized cache-basis K/V of the token being appended, applied as one
    more online-softmax step in the finalize block.  Replaces the caller-side
    merge_self_attention fusion chain and the m/l kernel outputs (~0.3 ms of
    small per-layer XLA fusions at decode shapes, trace r3)."""
    _attend_chunks(idx_ref, q_ref, kq_ref, kp_ref, vq_ref, vp_ref,
                   m_ref, l_ref, acc_ref, chunk=chunk, heads=heads,
                   int8_qk=int8_qk)

    @pl.when(pl.program_id(1) == nchunks - 1)
    def _():
        _self_fold_finalize(q_ref[0].astype(jnp.float32),
                            ks_ref[0].astype(jnp.float32),
                            vs_ref[0].astype(jnp.float32),
                            out_ref, m_ref, l_ref, acc_ref)


@functools.partial(jax.jit, static_argnames=("sm_scale", "chunk", "int8_qk",
                                             "interpret"))
def int4_decode_attention_stacked(q, kq_all, kp_all, vq_all, vp_all, layer,
                                  lengths, *, sm_scale=None, chunk: int = 512,
                                  int8_qk: bool = False,
                                  interpret: bool | None = None):
    """int4_decode_attention against layer `layer` of the stacked cache
    (L, B, Hkv, D/2, S) without slicing it (see _decode_kernel_pref).

    Returns (out, m, l): normalized attention over the CACHED tokens plus
    the online-softmax state, so the caller can fold in the current token's
    self term (merge_self_attention) without the cache ever being written
    by this kernel. out: (B, Hq, D); m, l: (B, Hkv, G) f32."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    B, Hq, D = q.shape
    L, _, Hkv, _, S = kq_all.shape
    G = Hq // Hkv
    Gp = max(8, G)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)

    qg = (q.astype(jnp.float32) * sm_scale).reshape(B, Hkv, G, D)
    if Gp != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))

    ch = pick_chunk(S, chunk)
    nchunks = S // ch

    def clamp_s(s, idx, b):
        # last chunk holding valid tokens for this sequence; repeating it
        # for the masked tail makes the pipeline skip those DMAs
        last = jnp.maximum((idx[1 + b] + ch - 1) // ch - 1, 0)
        return jnp.minimum(s, last)

    grid = (B, nchunks)
    out, m, l = pl.pallas_call(
        functools.partial(_decode_kernel_pref, chunk=ch, nchunks=nchunks,
                          heads=Hkv, int8_qk=int8_qk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, Hkv, Gp, D), lambda b, s, idx: (b, 0, 0, 0)),
                pl.BlockSpec((1, 1, Hkv, D // 2, ch),
                             lambda b, s, idx: (idx[0], b, 0, 0,
                                                clamp_s(s, idx, b))),
                pl.BlockSpec((1, 1, Hkv, 2, ch),
                             lambda b, s, idx: (idx[0], b, 0, 0,
                                                clamp_s(s, idx, b))),
                pl.BlockSpec((1, 1, Hkv, D // 2, ch),
                             lambda b, s, idx: (idx[0], b, 0, 0,
                                                clamp_s(s, idx, b))),
                pl.BlockSpec((1, 1, Hkv, 2, ch),
                             lambda b, s, idx: (idx[0], b, 0, 0,
                                                clamp_s(s, idx, b))),
            ],
            out_specs=[
                pl.BlockSpec((1, Hkv, Gp, D), lambda b, s, idx: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, Gp, 128),
                             lambda b, s, idx: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, Gp, 128),
                             lambda b, s, idx: (b, 0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((Hkv, Gp, 128), jnp.float32),
                pltpu.VMEM((Hkv, Gp, 128), jnp.float32),
                pltpu.VMEM((Hkv, Gp, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, Gp, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, Gp, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, Gp, 128), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                       lengths.astype(jnp.int32)]),
      qg, kq_all, kp_all, vq_all, vp_all)
    return (out[:, :, :G, :].reshape(B, Hq, D), m[:, :, :G, 0],
            l[:, :, :G, 0])


@functools.partial(jax.jit, static_argnames=("sm_scale", "chunk", "int8_qk",
                                             "interpret"))
def int4_decode_attention_stacked_self(q, kq_all, kp_all, vq_all, vp_all,
                                       layer, lengths, k_self, v_self, *,
                                       sm_scale=None, chunk: int = 512,
                                       int8_qk: bool = False,
                                       interpret: bool | None = None):
    """int4_decode_attention_stacked with the CURRENT token's self-attention
    term folded in-kernel.

    k_self/v_self: (B, Hkv, D) dequantized cache-basis K/V of the token
    being appended (i.e. unpack_dequant_head of its quantized form, so the
    math matches what the cache will hold).  Returns the fully normalized
    (B, Hq, D) attention output — no (m, l) state, no caller-side merge.
    The kernel still only READS the cache; the append stays separate."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    B, Hq, D = q.shape
    L, _, Hkv, _, S = kq_all.shape
    G = Hq // Hkv
    Gp = max(8, G)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)

    qg = (q.astype(jnp.float32) * sm_scale).reshape(B, Hkv, G, D)
    if Gp != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))

    ch = pick_chunk(S, chunk)
    nchunks = S // ch

    def clamp_s(s, idx, b):
        last = jnp.maximum((idx[1 + b] + ch - 1) // ch - 1, 0)
        return jnp.minimum(s, last)

    grid = (B, nchunks)
    out = pl.pallas_call(
        functools.partial(_decode_kernel_pref_self, chunk=ch,
                          nchunks=nchunks, heads=Hkv, int8_qk=int8_qk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, Hkv, Gp, D), lambda b, s, idx: (b, 0, 0, 0)),
                pl.BlockSpec((1, 1, Hkv, D // 2, ch),
                             lambda b, s, idx: (idx[0], b, 0, 0,
                                                clamp_s(s, idx, b))),
                pl.BlockSpec((1, 1, Hkv, 2, ch),
                             lambda b, s, idx: (idx[0], b, 0, 0,
                                                clamp_s(s, idx, b))),
                pl.BlockSpec((1, 1, Hkv, D // 2, ch),
                             lambda b, s, idx: (idx[0], b, 0, 0,
                                                clamp_s(s, idx, b))),
                pl.BlockSpec((1, 1, Hkv, 2, ch),
                             lambda b, s, idx: (idx[0], b, 0, 0,
                                                clamp_s(s, idx, b))),
                pl.BlockSpec((1, Hkv, D), lambda b, s, idx: (b, 0, 0)),
                pl.BlockSpec((1, Hkv, D), lambda b, s, idx: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Hkv, Gp, D),
                                   lambda b, s, idx: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((Hkv, Gp, 128), jnp.float32),
                pltpu.VMEM((Hkv, Gp, 128), jnp.float32),
                pltpu.VMEM((Hkv, Gp, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), q.dtype),
        interpret=interpret,
    )(jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                       lengths.astype(jnp.int32)]),
      qg, kq_all, kp_all, vq_all, vp_all,
      k_self.astype(jnp.float32), v_self.astype(jnp.float32))
    return out[:, :, :G, :].reshape(B, Hq, D)


def _decode_kernel_self_append(idx_ref, q_ref, kq_ref, kp_ref, vq_ref,
                               vp_ref, ks_ref, vs_ref, nkq_ref, nkp_ref,
                               nvq_ref, nvp_ref, out_ref, okq_ref,
                               okp_ref, ovq_ref, ovp_ref, m_ref, l_ref,
                               acc_ref, *, chunk, nchunks, heads,
                               mix=False, G=None, int8_qk=False):
    """Self-folding decode that ALSO appends the new token in the SAME
    kernel (the contiguous twin of paged_kv._paged_kernel_self_append):
    the finalize step's clamped-chunk DMA already holds the sequence chunk
    the append writes, so the updated chunk is emitted as an aliased
    output block — no separate append dispatch per layer per step.  When
    the append opens a fresh chunk, lanes beyond the new token carry stale
    content, always masked by `lengths` on read."""
    _attend_chunks(idx_ref, q_ref, kq_ref, kp_ref, vq_ref, vp_ref,
                   m_ref, l_ref, acc_ref, chunk=chunk, heads=heads,
                   int8_qk=int8_qk)
    b = pl.program_id(0)
    col = idx_ref[1 + b] % chunk

    @pl.when(pl.program_id(1) == nchunks - 1)
    def _():
        _self_fold_finalize(q_ref[0].astype(jnp.float32),
                            ks_ref[0].astype(jnp.float32),
                            vs_ref[0].astype(jnp.float32),
                            out_ref, m_ref, l_ref, acc_ref, mix, G)

        def wr(o_ref, c_ref, n_ref):
            h, x = n_ref.shape[1], n_ref.shape[2]
            lane = jax.lax.broadcasted_iota(jnp.int32, (h, x, chunk), 2)
            new = jnp.broadcast_to(n_ref[0, :, :, 0:1], (h, x, chunk))
            o_ref[0, 0] = jnp.where(lane == col, new, c_ref[0, 0])

        wr(okq_ref, kq_ref, nkq_ref)
        wr(okp_ref, kp_ref, nkp_ref)
        wr(ovq_ref, vq_ref, nvq_ref)
        wr(ovp_ref, vp_ref, nvp_ref)


@functools.partial(jax.jit, static_argnames=("sm_scale", "chunk",
                                             "mix_heads", "int8_qk",
                                             "interpret"))
def int4_decode_attention_self_append(q, kq_all, kp_all, vq_all, vp_all,
                                      layer, lengths, k_self, v_self,
                                      nkq, nkp, nvq, nvp, *, sm_scale=None,
                                      chunk: int = 512,
                                      mix_heads: bool = False,
                                      int8_qk: bool = False,
                                      interpret: bool | None = None):
    """Fused self-folding contiguous decode + in-place cache append.

    lengths counts CACHED tokens; the token is appended at position
    lengths[b].  k_self/v_self: (B, Hkv, D) dequantized cache-basis values
    (attention math); nkq/nvq: (B, Hkv, D/2, 1) lane-major packed values,
    nkp/nvp: (B, Hkv, 2, 1).  Returns (out, kq', kp', vq', vp')."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    B, Hq, D = q.shape
    L, _, Hkv, D2, S = kq_all.shape
    G = Hq // Hkv
    Gp = max(8, G)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)

    qg = (q.astype(jnp.float32) * sm_scale).reshape(B, Hkv, G, D)
    if Gp != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))

    ch = pick_chunk(S, chunk)
    nchunks = S // ch

    def clamp_s(s, idx, b):
        last = jnp.maximum((idx[1 + b] + ch - 1) // ch - 1, 0)
        return jnp.minimum(s, last)

    def cspec(x):
        return pl.BlockSpec((1, 1, Hkv, x, ch),
                            lambda b, s, idx, x=x: (idx[0], b, 0, 0,
                                                    clamp_s(s, idx, b)))

    def wspec(x):
        # the WRITE chunk (constant per batch row, flushed at row end)
        return pl.BlockSpec((1, 1, Hkv, x, ch),
                            lambda b, s, idx, x=x: (idx[0], b, 0, 0,
                                                    idx[1 + b] // ch))

    def nblk(x):
        return pl.BlockSpec((1, Hkv, x, 128), lambda b, s, idx: (b, 0, 0, 0))

    def bcast(v, dt):
        return jnp.broadcast_to(v.astype(dt), (*v.shape[:-1], 128))

    grid = (B, nchunks)
    in_specs = [
        pl.BlockSpec((1, Hkv, Gp, D), lambda b, s, idx: (b, 0, 0, 0)),
        cspec(D2), cspec(2), cspec(D2), cspec(2),
        pl.BlockSpec((1, Hkv, D), lambda b, s, idx: (b, 0, 0)),
        pl.BlockSpec((1, Hkv, D), lambda b, s, idx: (b, 0, 0)),
        nblk(D2), nblk(2), nblk(D2), nblk(2),
    ]
    if mix_heads:
        from rsq_tpu.core.hadamard import is_pow2
        assert is_pow2(Hq), "fused head mix needs a pow2 head count"
    out, kq2, kp2, vq2, vp2 = pl.pallas_call(
        functools.partial(_decode_kernel_self_append, chunk=ch,
                          nchunks=nchunks, heads=Hkv, mix=mix_heads, G=G,
                          int8_qk=int8_qk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, Hkv, Gp, D), lambda b, s, idx: (b, 0, 0, 0)),
                wspec(D2), wspec(2), wspec(D2), wspec(2),
            ],
            scratch_shapes=[
                pltpu.VMEM((Hkv, Gp, 128), jnp.float32),
                pltpu.VMEM((Hkv, Gp, 128), jnp.float32),
                pltpu.VMEM((Hkv, Gp, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, Gp, D), q.dtype),
            jax.ShapeDtypeStruct(kq_all.shape, kq_all.dtype),
            jax.ShapeDtypeStruct(kp_all.shape, kp_all.dtype),
            jax.ShapeDtypeStruct(vq_all.shape, vq_all.dtype),
            jax.ShapeDtypeStruct(vp_all.shape, vp_all.dtype),
        ],
        input_output_aliases={2: 1, 3: 2, 4: 3, 5: 4},
        interpret=interpret,
    )(jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                       lengths.astype(jnp.int32)]),
      qg, kq_all, kp_all, vq_all, vp_all,
      k_self.astype(jnp.float32), v_self.astype(jnp.float32),
      bcast(nkq, kq_all.dtype), bcast(nkp, kp_all.dtype),
      bcast(nvq, vq_all.dtype), bcast(nvp, vp_all.dtype))
    return out[:, :, :G, :].reshape(B, Hq, D), kq2, kp2, vq2, vp2


def _decode_kernel_bf16_pref(idx_ref, q_ref, k_ref, v_ref, out_ref,
                             m_out_ref, l_out_ref, m_ref, l_ref, acc_ref, *,
                             chunk, nchunks, heads):
    """16-bit twin of _decode_kernel_pref: flash decode over the stacked
    DENSE (L, B, H, S, D) cache, selected by the prefetched layer index —
    the bf16 serving path previously sliced the cache per layer under
    lax.scan, a ~190 MB relayout copy per step at 12 layers (r3 OOM dump).
    idx_ref = [layer, lengths...]; out-of-range chunks repeat the last
    valid block index so their DMAs are skipped (see _decode_kernel_pref).
    Emits online-softmax state (m, l) like the int4 kernel so the caller
    merges the current token's self term and the append stays in place."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    length = idx_ref[1 + pl.program_id(0)]
    base = s * chunk

    @pl.when(base < length)
    def _():
        for h in range(heads):
            qb = q_ref[0, h].astype(jnp.bfloat16)        # (Gp, D), pre-scaled
            kb = k_ref[0, 0, h]                           # (chunk, D) bf16
            logits = jax.lax.dot_general(
                qb, kb, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (Gp, chunk)

            pos = base + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(pos < length, logits, MASK_VALUE)

            m_prev = m_ref[h][:, 0:1]
            m_cur = jnp.max(logits, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(logits - m_new)                   # (Gp, chunk) f32
            l_new = (alpha * l_ref[h][:, 0:1]
                     + jnp.sum(p, axis=1, keepdims=True))

            t = jnp.dot(p.astype(jnp.bfloat16), v_ref[0, 0, h],
                        preferred_element_type=jnp.float32)  # (Gp, D)
            acc_ref[h] = acc_ref[h] * alpha + t
            m_ref[h] = jnp.broadcast_to(m_new, m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(l_new, l_ref.shape[1:])

    @pl.when(s == nchunks - 1)
    def _():
        out_ref[0] = (acc_ref[...] /
                      l_ref[...][:, :, 0:1]).astype(out_ref.dtype)
        m_out_ref[0] = m_ref[...]
        l_out_ref[0] = l_ref[...]


@functools.partial(jax.jit, static_argnames=("sm_scale", "chunk", "interpret"))
def bf16_decode_attention_stacked(q, k_all, v_all, layer, lengths, *,
                                  sm_scale=None, chunk: int = 512,
                                  interpret: bool | None = None):
    """One decode step of attention against layer `layer` of the stacked
    DENSE cache k_all/v_all: (L, B, Hkv, S, D) bf16, copy-free.
    Returns (out, m, l) like int4_decode_attention_stacked."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    B, Hq, D = q.shape
    L, _, Hkv, S, _ = k_all.shape
    G = Hq // Hkv
    Gp = max(8, G)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)

    qg = (q.astype(jnp.float32) * sm_scale).reshape(B, Hkv, G, D)
    if Gp != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))

    ch = pick_chunk(S, chunk)
    nchunks = S // ch

    def clamp_s(s, idx, b):
        last = jnp.maximum((idx[1 + b] + ch - 1) // ch - 1, 0)
        return jnp.minimum(s, last)

    grid = (B, nchunks)
    out, m, l = pl.pallas_call(
        functools.partial(_decode_kernel_bf16_pref, chunk=ch,
                          nchunks=nchunks, heads=Hkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, Hkv, Gp, D), lambda b, s, idx: (b, 0, 0, 0)),
                pl.BlockSpec((1, 1, Hkv, ch, D),
                             lambda b, s, idx: (idx[0], b, 0,
                                                clamp_s(s, idx, b), 0)),
                pl.BlockSpec((1, 1, Hkv, ch, D),
                             lambda b, s, idx: (idx[0], b, 0,
                                                clamp_s(s, idx, b), 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, Hkv, Gp, D), lambda b, s, idx: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, Gp, 128),
                             lambda b, s, idx: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, Gp, 128),
                             lambda b, s, idx: (b, 0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((Hkv, Gp, 128), jnp.float32),
                pltpu.VMEM((Hkv, Gp, 128), jnp.float32),
                pltpu.VMEM((Hkv, Gp, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, Gp, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, Gp, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, Gp, 128), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                       lengths.astype(jnp.int32)]),
      qg, k_all, v_all)
    return (out[:, :, :G, :].reshape(B, Hq, D), m[:, :, :G, 0],
            l[:, :, :G, 0])


def _append_kernel_bf16(idx_ref, kc_ref, vc_ref, nk_ref, nv_ref, ok_ref,
                        ov_ref):
    """In-place one-token append into the stacked DENSE cache: each grid
    step read-modify-writes the 16-sublane window containing this
    sequence's write row (token-major layout, D in lanes; 16 rows = one
    full bf16 (16, 128) tile, so the aliased window is tile-aligned —
    Mosaic cannot address a sub-tile bf16 window at a dynamic offset)."""
    b = pl.program_id(0)
    row = idx_ref[1 + b] % 16

    def wr(o_ref, c_ref, n_ref):
        h, _, d = n_ref.shape[1:]
        sub = jax.lax.broadcasted_iota(jnp.int32, (h, 16, d), 1)
        o_ref[0, 0] = jnp.where(sub == row, n_ref[0], c_ref[0, 0])

    wr(ok_ref, kc_ref, nk_ref)
    wr(ov_ref, vc_ref, nv_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_append_stacked_bf16(k, v, layer, pos, nk, nv, *,
                           interpret: bool | None = None):
    """Append one token per sequence into layer `layer` of the stacked
    dense cache, in place (aliased windows).  k/v: (L, B, H, S, D) bf16
    with S a multiple of 16 (full-tile windows); pos: (B,) write
    positions; nk/nv: (B, H, 1, D)."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    L, B, H, S, D = k.shape
    assert S % 16 == 0, "bf16 cache max_seq must be a multiple of 16"
    scal = jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                            pos.astype(jnp.int32)])

    def cwin():
        return pl.BlockSpec((1, 1, H, 16, D),
                            lambda b, idx: (idx[0], b, 0, idx[1 + b] // 16,
                                            0))

    def nblk():
        return pl.BlockSpec((1, H, 16, D), lambda b, idx: (b, 0, 0, 0))

    def bcast(x):
        return jnp.broadcast_to(x.astype(k.dtype),
                                (x.shape[0], x.shape[1], 16, x.shape[3]))

    return pl.pallas_call(
        _append_kernel_bf16,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[cwin(), cwin(), nblk(), nblk()],
            out_specs=[cwin(), cwin()],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(scal, k, v, bcast(nk), bcast(nv))


def _append_kernel(idx_ref, kqc_ref, kpc_ref, vqc_ref, vpc_ref, nkq_ref,
                   nkp_ref, nvq_ref, nvp_ref, okq_ref, okp_ref, ovq_ref,
                   ovp_ref):
    """In-place one-token append into the stacked cache: each grid step
    read-modify-writes the 128-lane window containing this sequence's write
    position (input_output_aliases make the windows update in place).

    New-value operands arrive PRE-BROADCAST to 128 lanes: sub-lane-width
    (e.g. 1-lane) uint8 blocks crash the Mosaic compiler, and u8->f32
    casts are unsupported in-kernel, so the select runs lane-for-lane in
    the native dtypes."""
    b = pl.program_id(0)
    col = idx_ref[1 + b] % 128

    def wr(o_ref, c_ref, n_ref):
        h, x = n_ref.shape[1], n_ref.shape[2]
        lane = jax.lax.broadcasted_iota(jnp.int32, (h, x, 128), 2)
        o_ref[0, 0] = jnp.where(lane == col, n_ref[0], c_ref[0, 0])

    wr(okq_ref, kqc_ref, nkq_ref)
    wr(okp_ref, kpc_ref, nkp_ref)
    wr(ovq_ref, vqc_ref, nvq_ref)
    wr(ovp_ref, vpc_ref, nvp_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_append_stacked(kq, kp, vq, vp, layer, pos, nkq, nkp, nvq, nvp, *,
                      interpret: bool | None = None):
    """Append one token per sequence into layer `layer` of the stacked
    cache, in place (aliased Pallas windows).  Replaces 4 x B
    dynamic_update_slice ops per layer — their dispatch overhead was
    1.5 ms of the 12.5 ms decode step (trace_decode r3).

    kq/vq: (L, B, H, D/2, S) uint8; kp/vp: (L, B, H, 2, S) f32.
    pos: (B,) int32 write positions (< S).
    nkq/nvq: (B, H, D/2, 1) lane-major token values; nkp/nvp: (B, H, 2, 1).
    Returns the four updated cache arrays."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    L, B, H, D2, S = kq.shape
    scal = jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                            pos.astype(jnp.int32)])

    def cwin(x):
        return pl.BlockSpec((1, 1, H, x, 128),
                            lambda b, idx, x=x: (idx[0], b, 0, 0,
                                                 idx[1 + b] // 128))

    def nblk(x):
        return pl.BlockSpec((1, H, x, 128), lambda b, idx: (b, 0, 0, 0))

    def bcast(v, dt):
        return jnp.broadcast_to(v.astype(dt), (*v.shape[:-1], 128))

    return pl.pallas_call(
        _append_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
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
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        interpret=interpret,
    )(scal, kq, kp, vq, vp,
      bcast(nkq, kq.dtype), bcast(nkp, kp.dtype),
      bcast(nvq, vq.dtype), bcast(nvp, vp.dtype))


def merge_self_attention(out_old, m_old, l_old, q_scaled, k_self, v_self):
    """Fold the current token's self-attention term into the kernel's
    online-softmax state.  q_scaled: (B, Hkv, G, D) f32 ALREADY scaled by
    sm_scale; k_self/v_self: (B, Hkv, 1, D) f32 dequantized cache-basis
    values of the token being appended.  Exact: this is one more step of
    the same online softmax the kernel runs."""
    B, Hq, D = out_old.shape
    _, Hkv, G, _ = q_scaled.shape
    logit = jnp.einsum("bhgd,bhod->bhg", q_scaled,
                       k_self.astype(jnp.float32))       # (B, Hkv, G)
    m_new = jnp.maximum(m_old, logit)
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(logit - m_new)
    w_old = l_old * alpha                                 # (B, Hkv, G)
    o_old = out_old.astype(jnp.float32).reshape(B, Hkv, G, D)
    # w_old == 0 (empty cache) -> o_old is 0/0; mask it out of the merge
    o_term = jnp.where(w_old[..., None] > 0, o_old * w_old[..., None], 0.0)
    merged = (o_term + p[..., None] * v_self.astype(jnp.float32)) \
        / (w_old + p)[..., None]
    return merged.reshape(B, Hq, D).astype(out_old.dtype)


def int4_decode_attention_reference(q, kq, kp, vq, vp, lengths, sm_scale=None):
    """Pure-jnp oracle on the lane-major cache: dequantize everything,
    masked softmax attention."""
    B, Hq, D = q.shape
    _, Hkv, _, S = kq.shape
    G = Hq // Hkv
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    k = unpack_dequant_head(jnp.swapaxes(kq, -1, -2),
                            jnp.swapaxes(kp, -1, -2))   # (B, Hkv, S, D)
    v = unpack_dequant_head(jnp.swapaxes(vq, -1, -2),
                            jnp.swapaxes(vp, -1, -2))
    qg = q.astype(jnp.float32).reshape(B, Hkv, G, D)
    logits = jnp.einsum("bhgd,bhsd->bhgs", qg, k) * sm_scale
    mask = jnp.arange(S)[None, None, None, :] < lengths[:, None, None, None]
    logits = jnp.where(mask, logits, MASK_VALUE)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgs,bhsd->bhgd", p, v)
    return out.reshape(B, Hq, D).astype(q.dtype)
