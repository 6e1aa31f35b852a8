"""Fused dequant INT4 matmul kernels.

TPU replacement for the reference's CUTLASS INT4xINT4 GEMM + separate
sym_quant/sym_dequant kernels (quarot/kernels/gemm.cu:6-45, quant.cu:11-97):
here quantization of activations, the matmul, and the dual-scale dequant are
ONE Pallas kernel, so intermediate int tensors never touch HBM.

Weight layout — "planar" int4 packing of W (K, N) stored as uint8 (K, N/2):
byte (k, j) holds value (k, j) in the low nibble and (k, j + N/2) in the
high nibble.  Unpacking is then two shifts + a concat along N — no lane
interleaving (unlike the reference's adjacent-pair packing,
quant_utils.py:114-121, which we keep only for checkpoint compat in
core.quant.pack_int4).

The MXU path computes int4xint4 products in bf16 with f32 accumulation:
|values| <= 7 and <= 8, products <= 56, row sums <= K*56 < 2^24 — every step
is exactly representable, so results are bit-identical to integer GEMM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _divisor_block(n: int, target: int, align: int = 128) -> int:
    """Largest lane-aligned block <= target that DIVIDES n (the stacked
    prefetch kernels cannot pad — padding would reintroduce the copy)."""
    if n <= target:
        return n
    for b in range(min(target, n - n % align), 0, -align):
        if n % b == 0:
            return b
    return n


# ---------------------------------------------------------------------------
# Packing (host/jnp level)
# ---------------------------------------------------------------------------

def pack_group(n: int) -> int:
    """Planar pairing group. Each byte's two nibbles are outputs (2j, 2j+1):
    adjacent pairing means any even tensor-parallel shard boundary keeps a
    byte's outputs on one shard, and the (M, 2, N/2) -> (M, N) un-pairing is
    a cheap XLA transpose on the OUTPUT — the kernel still never
    interleaves lanes on the 4-bit weight data."""
    return 2


def pack_w4_planar(wq) -> jax.Array:
    """wq: int values in [-8, 7], shape (K, N) with N even -> uint8 (K, N/2).

    Byte (k, g*P + j) holds outputs (k, g*2P + j) [low nibble] and
    (k, g*2P + P + j) [high nibble], with P = group/2."""
    w = jnp.asarray(wq, jnp.int8)
    u = jnp.where(w < 0, w + 16, w).astype(jnp.uint8)
    n = u.shape[-1]
    g = pack_group(n)
    ug = u.reshape(*u.shape[:-1], n // g, 2, g // 2)
    lo = ug[..., 0, :]
    hi = ug[..., 1, :]
    return (lo | (hi << 4)).reshape(*u.shape[:-1], n // 2).astype(jnp.uint8)


def unpack_w4_planar(p) -> jax.Array:
    """Inverse of pack_w4_planar; returns int8 (K, N)."""
    n = p.shape[-1] * 2
    g = pack_group(n)
    pg = p.reshape(*p.shape[:-1], n // g, g // 2)
    lo = (pg & 0x0F).astype(jnp.int8)
    hi = ((pg >> 4) & 0x0F).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=-2)  # (..., n//g, 2, g//2)
    return out.reshape(*p.shape[:-1], n)


def pair_scales(scale) -> jax.Array:
    """(N,) per-output scales -> (2, N/2) aligned with the packed planes."""
    n = scale.shape[-1]
    g = pack_group(n)
    s = scale.reshape(n // g, 2, g // 2)
    return jnp.moveaxis(s, 1, 0).reshape(2, n // 2)


def unpair_outputs(y3) -> jax.Array:
    """(M, 2, N/2) plane-paired kernel output -> (M, N)."""
    m = y3.shape[0]
    n = y3.shape[-1] * 2
    g = pack_group(n)
    y = y3.reshape(m, 2, n // g, g // 2)
    return jnp.moveaxis(y, 1, 2).reshape(m, n)


def _unpack_block_bf16(wp):
    """uint8 (BK, BN) -> two bf16 (BK, BN) nibble planes.

    Nibble extraction runs in int32: Mosaic has no int8 vector shift
    (arith.shrui on i8 fails to legalize), and i32 is the native VPU lane
    width anyway.  Sign extension is (w << s) >> (arithmetic) — 2 VPU ops
    per plane instead of mask+compare+select (the unpack is the kernel's
    bottleneck at decode: shift unpack measured 618 GB/s vs 424 GB/s for
    mask+where, benchmarks/stacked_sweep.py on v5e)."""
    w = wp.astype(jnp.int32)
    lo = ((w << 28) >> 28).astype(jnp.bfloat16)
    hi = ((w << 24) >> 28).astype(jnp.bfloat16)
    return lo, hi


# ---------------------------------------------------------------------------
# Weight-only W4 matmul: y = (x @ dequant(W)) ; scale per output column
# ---------------------------------------------------------------------------

def _w4_matmul_kernel(x_ref, wp_ref, scale_ref, out_ref, acc_ref, *,
                      nsteps_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    lo, hi = _unpack_block_bf16(wp_ref[...])
    acc_ref[:, 0, :] += jnp.dot(x, lo, preferred_element_type=jnp.float32)
    acc_ref[:, 1, :] += jnp.dot(x, hi, preferred_element_type=jnp.float32)

    @pl.when(k == nsteps_k - 1)
    def _():
        out_ref[...] = (acc_ref[...] * scale_ref[...].astype(jnp.float32)
                        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "decode", "interpret"))
def w4_matmul(x, w_packed, scale, *, block_m: int | None = None,
              block_n: int | None = None, block_k: int | None = None,
              decode: bool | None = None,
              interpret: bool | None = None):
    """y = x @ dequant(W).  x: (M, K) bf16/f32; w_packed: uint8 (K, N/2)
    planar; scale: (N,) f32 per-output-column (GPTQ per-channel).
    Returns (M, N) in x.dtype."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    M, K = x.shape
    Kw, Nh = w_packed.shape
    assert K == Kw
    N = Nh * 2

    bm, bn, bk = _decode_blocks(M, K, Nh, block_m, block_n, block_k, decode)
    pm, pn, pk = (-M) % bm, (-Nh) % bn, (-K) % bk
    if pm or pk:
        x = jnp.pad(x, ((0, pm), (0, pk)))
    if pk or pn:
        w_packed = jnp.pad(w_packed, ((0, pk), (0, pn)))
    scale2 = pair_scales(scale)
    if pn:
        scale2 = jnp.pad(scale2, ((0, 0), (0, pn)))
    Mp, Khp = x.shape[0], w_packed.shape[0]
    Nhp = w_packed.shape[1]
    nk = Khp // bk

    grid = (Mp // bm, Nhp // bn, nk)
    out3 = pl.pallas_call(
        functools.partial(_w4_matmul_kernel, nsteps_k=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((2, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, 2, bn), lambda i, j, k: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, 2, Nhp), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, 2, bn), jnp.float32)],
        interpret=interpret,
    )(x, w_packed, scale2)
    y = unpair_outputs(out3[:, :, :Nh])
    return y[:M]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "decode", "interpret"))
def w4_matmul_paired(x, w_packed, scale2, *, block_m: int | None = None,
                     block_n: int | None = None, block_k: int | None = None,
                     decode: bool | None = None,
                     interpret: bool | None = None):
    """Paired-scale W4 matmul: scale2 (2, Nh) pre-paired, output (M, 2, Nh)
    plane-paired (for fused concatenated-output callers)."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    M, K = x.shape
    Nh = w_packed.shape[1]
    bm, bn, bk = _decode_blocks(M, K, Nh, block_m, block_n, block_k, decode)
    pm, pn, pk = (-M) % bm, (-Nh) % bn, (-K) % bk
    if pm or pk:
        x = jnp.pad(x, ((0, pm), (0, pk)))
    if pk or pn:
        w_packed = jnp.pad(w_packed, ((0, pk), (0, pn)))
    if pn:
        scale2 = jnp.pad(scale2, ((0, 0), (0, pn)))
    Mp, Nhp, Kp = x.shape[0], w_packed.shape[1], x.shape[1]
    nk = Kp // bk
    grid = (Mp // bm, Nhp // bn, nk)
    out3 = pl.pallas_call(
        functools.partial(_w4_matmul_kernel, nsteps_k=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((2, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, 2, bn), lambda i, j, k: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, 2, Nhp), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, 2, bn), jnp.float32)],
        interpret=interpret,
    )(x, w_packed, scale2)
    return out3[:M, :, :Nh]


def w4_matmul_reference(x, w_packed, scale):
    """Pure-jnp oracle."""
    wq = unpack_w4_planar(w_packed).astype(jnp.float32)
    return (jnp.asarray(x, jnp.float32) @ wq * scale[None, :]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Affine W4 matmul: y = (x @ (unpack(W) + zero)) * scale, with a per-tensor
# scalar scale.  The E8P (2-bit lattice) serving path uses this: every E8P
# grid value is an odd multiple of 1/4 in [-11/4, 11/4] (D8 + 1/4 coset), so
# 4w = 2m - 15 with m in {2..13} — i.e. w = (q + 0.5) * (scale/2) with
# q = m - 8 a signed int4.  Re-encoding the codes this way at convert time
# is LOSSLESS (bit-identical dequantized weights) and turns E8P serving into
# a standard planar-int4 read at 4 bits/weight — on TPU this beats decoding
# the 2^16-entry codebook in-kernel (no native vector gather; a one-hot MXU
# decode costs ~30x the matmul FLOPs).  Counterpart of quiptools_cuda's
# fused decompress-matmul (fake_quant/ldlq_utils.py:10,398-402).
# ---------------------------------------------------------------------------

def _w4_affine_kernel(x_ref, xsum_ref, wp_ref, sh_ref, out_ref, acc_ref, *,
                      nsteps_k, zero):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    lo, hi = _unpack_block_bf16(wp_ref[...])
    acc_ref[:, 0, :] += jnp.dot(x, lo, preferred_element_type=jnp.float32)
    acc_ref[:, 1, :] += jnp.dot(x, hi, preferred_element_type=jnp.float32)

    @pl.when(k == nsteps_k - 1)
    def _():
        sh = sh_ref[0]
        corr = zero * xsum_ref[...][:, :, None]      # (bm, 1, 1)
        out_ref[...] = ((acc_ref[...] + corr) * sh).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("zero", "block_m", "block_n",
                                             "block_k", "decode",
                                             "plane_major", "interpret"))
def w4_affine_matmul(x, w_packed, scale, *, zero: float = 0.5,
                     block_m: int | None = None, block_n: int | None = None,
                     block_k: int | None = None, decode: bool | None = None,
                     plane_major: bool = False,
                     interpret: bool | None = None):
    """y = x @ ((unpack(W) + zero) * scale).  x: (M, K); w_packed: uint8
    (K, N/2) planar; scale: scalar (per-tensor).  The constant offset folds
    into a rank-1 row-sum correction: y = (x @ q + zero * sum_k x) * scale.
    plane_major: byte j holds natural cols (j, j+Nh) (params.
    repack_plane_major) — un-pairing is then a free reshape."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    M, K = x.shape
    Kw, Nh = w_packed.shape
    assert K == Kw
    xsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)  # (M, 1)

    bm, bn, bk = _decode_blocks(M, K, Nh, block_m, block_n, block_k, decode)
    pm, pn, pk = (-M) % bm, (-Nh) % bn, (-K) % bk
    if pm or pk:
        x = jnp.pad(x, ((0, pm), (0, pk)))
    if pm:
        xsum = jnp.pad(xsum, ((0, pm), (0, 0)))
    if pk or pn:
        w_packed = jnp.pad(w_packed, ((0, pk), (0, pn)))
    Mp, Nhp, Kp = x.shape[0], w_packed.shape[1], x.shape[1]
    nk = Kp // bk

    grid = (Mp // bm, Nhp // bn, nk)
    out3 = pl.pallas_call(
        functools.partial(_w4_affine_kernel, nsteps_k=nk, zero=zero),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, 2, bn), lambda i, j, k: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, 2, Nhp), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, 2, bn), jnp.float32)],
        interpret=interpret,
    )(x, xsum, w_packed, jnp.asarray(scale, jnp.float32).reshape(1))
    if plane_major:
        y = out3[:, :, :Nh].reshape(out3.shape[0], 2 * Nh)
    else:
        y = unpair_outputs(out3[:, :, :Nh])
    return y[:M]


def w4_affine_matmul_reference(x, w_packed, scale, zero: float = 0.5):
    """Pure-jnp oracle."""
    wq = unpack_w4_planar(w_packed).astype(jnp.float32)
    w = (wq + zero) * jnp.asarray(scale, jnp.float32)
    return (jnp.asarray(x, jnp.float32) @ w).astype(x.dtype)


# ---------------------------------------------------------------------------
# Joint W4A4: per-token sym-quantize x to int4 inside the kernel, int4xint4
# matmul, dual-scale dequant epilogue (the quarot serving contract:
# Quantizer -> Linear4bit -> sym_dequant; quarot/nn/linear.py:42-56).
#
# Two MXU paths:
#   bf16: exact (|products| <= 56, sums < 2^24) — used for prefill (large M,
#         compute-rich).
#   int8: s8 x s8 -> s32 — the MXU loads int8 weights at 2x the bf16 rate,
#         which is THE decode bottleneck (block_sweep.py: DMA+unpack alone
#         streams at ~700 GB/s while the bf16-dot kernel caps at ~245 GB/s
#         independent of block shape).  Integer accumulation is exact.
# ---------------------------------------------------------------------------

def _unpack_block_i8(wp):
    """uint8 (BK, BN) -> two int8 (BK, BN) nibble planes (via i32 shifts;
    see _unpack_block_bf16 for why)."""
    w = wp.astype(jnp.int32)
    lo = ((w << 28) >> 28).astype(jnp.int8)
    hi = ((w << 24) >> 28).astype(jnp.int8)
    return lo, hi


def _unpack_block_i8_biased(wp):
    """uint8 (BK, BN) -> two int8 nibble planes BIASED by +8 (values q+8 in
    [0, 15]).

    Works on packed i32 words (pltpu.bitcast keeps the lane dim and folds 4
    sublanes per word): one mask + one xor per FOUR bytes for the low plane
    (plus one shift for the high), vs ~8 widening i32 ops per byte for the
    shift unpack — measured 698 vs 612 GB/s weight streaming on v5e at
    decode shapes.  The xor flips each nibble's sign bit, turning two's
    complement into offset binary: u ^ 8 == q + 8 for q in [-8, 7].  The
    bias is removed exactly by the caller as a rank-1 i32 correction
    (dot(xq, q+8) == dot(xq, q) + 8*rowsum(xq)); a direct in-kernel i8
    subtract is not lowerable (crashes the Mosaic backend).  Requires
    BK % 4 == 0."""
    w32 = pltpu.bitcast(wp, jnp.int32)
    lo = pltpu.bitcast((w32 & 0x0F0F0F0F) ^ 0x08080808, jnp.int8)
    hi = pltpu.bitcast(((w32 >> 4) & 0x0F0F0F0F) ^ 0x08080808, jnp.int8)
    return lo, hi


def _w4a4_kernel_i8(x_ref, xs_ref, wp_ref, scale_ref, out_ref, acc_ref, *,
                    nsteps_k, biased):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    inv = 1.0 / xs_ref[...]                     # (bm, 1)
    xq = jnp.clip(jnp.round(x_ref[...].astype(jnp.float32) * inv), -8, 7)
    xq = xq.astype(jnp.int8)
    # two dots, NO concat: the (bk, 2bn) concat copy costs more than the
    # second dot's pipeline bubble (618 vs 547 GB/s, stacked_sweep.py)
    if biased:
        lo, hi = _unpack_block_i8_biased(wp_ref[...])
        # exact: integer domain; removes the +8 plane bias
        corr = 8 * jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
        acc_ref[:, 0, :] += jnp.dot(
            xq, lo, preferred_element_type=jnp.int32) - corr
        acc_ref[:, 1, :] += jnp.dot(
            xq, hi, preferred_element_type=jnp.int32) - corr
    else:
        lo, hi = _unpack_block_i8(wp_ref[...])
        acc_ref[:, 0, :] += jnp.dot(xq, lo, preferred_element_type=jnp.int32)
        acc_ref[:, 1, :] += jnp.dot(xq, hi, preferred_element_type=jnp.int32)

    @pl.when(k == nsteps_k - 1)
    def _():
        deq = (acc_ref[...].astype(jnp.float32) * xs_ref[...][:, None, :]
               * scale_ref[...].astype(jnp.float32))
        out_ref[...] = deq.astype(out_ref.dtype)

def _w4a4_kernel(x_ref, xs_ref, wp_ref, scale_ref, out_ref, acc_ref, *,
                 nsteps_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # quantize this K-slab of x with the precomputed per-token scale
    inv = 1.0 / xs_ref[...]                     # (bm, 1)
    xq = jnp.clip(jnp.round(x_ref[...].astype(jnp.float32) * inv), -8, 7)
    xq = xq.astype(jnp.bfloat16)
    lo, hi = _unpack_block_bf16(wp_ref[...])
    acc_ref[:, 0, :] += jnp.dot(xq, lo, preferred_element_type=jnp.float32)
    acc_ref[:, 1, :] += jnp.dot(xq, hi, preferred_element_type=jnp.float32)

    @pl.when(k == nsteps_k - 1)
    def _():
        deq = (acc_ref[...] * xs_ref[...][:, None, :]
               * scale_ref[...].astype(jnp.float32))
        out_ref[...] = deq.astype(out_ref.dtype)


def _decode_blocks(M, K, Nh, block_m, block_n, block_k, decode=None):
    """Block-shape defaults (None = auto).  Decode shapes (small M) want
    FEW, BIG grid steps: the measured per-grid-step overhead (~0.6 us) caps
    streaming at ~200 GB/s with 128 KB weight tiles, so widen tiles to
    multi-MB until the DMA dominates (block_sweep.py numbers on v5e).

    Prefill shapes (large M) are gated by the PER-i-STEP weight unpack:
    the (bk, bn) nibble planes re-unpack for every M-block, so a small bm
    multiplies VPU unpack work by M/bm.  The r5 sweep moved the prefill
    defaults (128, 256, 512) -> (512, 512, 1024): 66 -> 114-128 TFLOP/s
    across the four Llama-3-8B linear shapes at M=2048 (bm=1024+ or
    bn>=1024 overflow VMEM on some shapes).

    `decode` is the caller's explicit hint (serving paths know which phase
    they are in); None falls back to the M<=32 shape heuristic (ADVICE r2
    #4: short-prompt prefill should not silently get decode tiles)."""
    if decode is None:
        decode = M <= 32
    # decode defaults from the v5e sweep: (bn=2048, bk=1024) is the fastest
    # shape that compiles (4 MB double-buffered weight tiles overflow VMEM)
    if block_n is None:
        block_n = 2048 if decode else 512
    if block_k is None:
        block_k = 1024
    # bm=512 measured best through M=4096; an M=8192 kernel-level probe
    # preferred 256 (144.7 vs 125.7 TFLOP/s) but the END-TO-END prefill at
    # that M measured WORSE with 256 (1587 vs 1548 ms) — kept flat at 512
    return (min(block_m or (128 if decode else 512), _round_up(M, 16)),
            min(block_n, Nh), min(block_k, K))


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "clip_ratio", "decode",
                                             "interpret", "mxu_int8"))
def w4a4_matmul_paired(x, w_packed, scale2, token_scale=None, *,
                       clip_ratio: float = 1.0,
                       block_m: int | None = None,
                       block_n: int | None = None,
                       block_k: int | None = None,
                       decode: bool | None = None,
                       mxu_int8: bool | None = None,
                       interpret: bool | None = None):
    """Paired-scale core of the W4A4 matmul: takes plane-paired scales
    (2, Nh) and returns the plane-paired output (M, 2, Nh).  Callers that
    CONCATENATE several packed matrices along the output dim (fused qkv /
    up-gate) pair each segment's scales and unpair each output segment."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    M, K = x.shape
    Nh = w_packed.shape[1]

    if token_scale is None:
        # per-token scales need the full row: compute once outside the grid
        # (one cheap VPU pass), pass into the kernel for quant + epilogue.
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
        xs = jnp.where(absmax == 0, 1.0, absmax * clip_ratio / 7.0)
    else:
        xs = token_scale.astype(jnp.float32).reshape(M, 1)

    bm, bn, bk = _decode_blocks(M, K, Nh, block_m, block_n, block_k, decode)
    pm, pn, pk = (-M) % bm, (-Nh) % bn, (-K) % bk
    if pm or pk:
        x = jnp.pad(x, ((0, pm), (0, pk)))
    if pm:
        xs = jnp.pad(xs, ((0, pm), (0, 0)), constant_values=1.0)
    if pk or pn:
        w_packed = jnp.pad(w_packed, ((0, pk), (0, pn)))
    if pn:
        scale2 = jnp.pad(scale2, ((0, 0), (0, pn)))
    Mp, Nhp, Kp = x.shape[0], w_packed.shape[1], x.shape[1]
    nk = Kp // bk

    if mxu_int8 is None:
        # decode shapes: MXU weight-load bound -> int8
        mxu_int8 = (M <= 32) if decode is None else decode
    if mxu_int8:
        kern = functools.partial(_w4a4_kernel_i8, biased=bk % 4 == 0)
    else:
        kern = _w4a4_kernel
    acc_dtype = jnp.int32 if mxu_int8 else jnp.float32

    grid = (Mp // bm, Nhp // bn, nk)
    out3 = pl.pallas_call(
        functools.partial(kern, nsteps_k=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((2, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, 2, bn), lambda i, j, k: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, 2, Nhp), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, 2, bn), acc_dtype)],
        interpret=interpret,
    )(x, xs, w_packed, scale2)
    return out3[:M, :, :Nh]


def _w4a4_kernel_i8_pref(idx_ref, x_ref, xs_ref, wp_ref, scale_ref, out_ref,
                         acc_ref, *, nsteps_k, biased):
    """Scalar-prefetch variant: wp_ref is a (1, bk, bn) block of the FULL
    stacked (L, K, Nh) weights, selected by the prefetched layer index —
    the layer loop never slices (= copies) a weight matrix in HBM."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    inv = 1.0 / xs_ref[...]
    xq = jnp.clip(jnp.round(x_ref[...].astype(jnp.float32) * inv), -8, 7)
    xq = xq.astype(jnp.int8)
    if biased:
        lo, hi = _unpack_block_i8_biased(wp_ref[0])
        corr = 8 * jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
        acc_ref[:, 0, :] += jnp.dot(
            xq, lo, preferred_element_type=jnp.int32) - corr
        acc_ref[:, 1, :] += jnp.dot(
            xq, hi, preferred_element_type=jnp.int32) - corr
    else:
        lo, hi = _unpack_block_i8(wp_ref[0])
        acc_ref[:, 0, :] += jnp.dot(xq, lo, preferred_element_type=jnp.int32)
        acc_ref[:, 1, :] += jnp.dot(xq, hi, preferred_element_type=jnp.int32)

    @pl.when(k == nsteps_k - 1)
    def _():
        deq = (acc_ref[...].astype(jnp.float32) * xs_ref[...][:, None, :]
               * scale_ref[...].astype(jnp.float32))
        out_ref[...] = deq.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "clip_ratio", "out_dtype",
                                             "interpret"))
def w4a4_matmul_paired_stacked(x, wp_all, scale2, layer, token_scale=None, *,
                               clip_ratio: float = 1.0,
                               block_m: int | None = None,
                               block_n: int | None = None,
                               block_k: int | None = None,
                               out_dtype=None,
                               interpret: bool | None = None):
    """W4A4 matmul against layer `layer` of STACKED weights wp_all
    (L, K, Nh) without slicing them: the layer index is a scalar-prefetch
    operand consumed by the weight BlockSpec's index_map, so the kernel DMAs
    only that layer's tiles straight from the stacked buffer.  A
    `wp_all[layer]` slice feeding pallas_call would materialize a 100 MB+
    HBM copy per layer per step (custom calls cannot fuse dynamic-slice) —
    measured at ~2/3 of the whole decode step's HBM traffic.

    scale2: (2, Nh) pre-paired scales for THIS layer (sliced by the caller;
    ~100 KB, negligible).  Returns plane-paired (M, 2, Nh).  Decode int8-MXU
    path only (the prefill/a4 path uses the unstacked kernels)."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    M, K = x.shape
    L, Kw, Nh = wp_all.shape
    assert K == Kw

    if token_scale is None:
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                         keepdims=True)
        xs = jnp.where(absmax == 0, 1.0, absmax * clip_ratio / 7.0)
    else:
        xs = token_scale.astype(jnp.float32).reshape(M, 1)

    bm, bn, bk = _decode_blocks(M, K, Nh, block_m, block_n, block_k)
    bn = _divisor_block(Nh, bn)
    bk = _divisor_block(K, bk)
    pm, pk = (-M) % bm, (-K) % bk
    assert Nh % bn == 0 and K % bk == 0, (
        "stacked weights must be pre-padded to block multiples")
    if pm:
        x = jnp.pad(x, ((0, pm), (0, 0)))
        xs = jnp.pad(xs, ((0, pm), (0, 0)), constant_values=1.0)
    Mp = x.shape[0]
    nk = K // bk

    grid = (Mp // bm, Nh // bn, nk)
    out3 = pl.pallas_call(
        functools.partial(_w4a4_kernel_i8_pref, nsteps_k=nk,
                          biased=bk % 4 == 0),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k, idx: (i, k)),
                pl.BlockSpec((bm, 1), lambda i, j, k, idx: (i, 0)),
                pl.BlockSpec((1, bk, bn),
                             lambda i, j, k, idx: (idx[0], k, j)),
                pl.BlockSpec((2, bn), lambda i, j, k, idx: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, 2, bn),
                                   lambda i, j, k, idx: (i, 0, j)),
            scratch_shapes=[pltpu.VMEM((bm, 2, bn), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, 2, Nh), out_dtype or x.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, xs, wp_all, scale2)
    return out3[:M]


def _w4_kernel_pref(idx_ref, x_ref, wp_ref, scale_ref, out_ref, acc_ref, *,
                    nsteps_k, biased):
    """Scalar-prefetch weight-only W4 kernel over stacked (L, K, Nh) weights
    (bf16 x, no activation quant) — the non-a4 twin of
    _w4a4_kernel_i8_pref (ADVICE r2 #5)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if biased:
        # float-domain bias removal: dot(x, q+8) - 8*sum(x).  The two terms
        # round with different accumulation orders, amplifying f32 rounding
        # by |8*sum(x)| / |y| — worst case ~3.2*sqrt(bk)/sigma_w ~ 1e2 for
        # one-signed activations, i.e. ~1e-5 relative error: well below the
        # bf16 output precision (4e-3) this path returns.
        lo8, hi8 = _unpack_block_i8_biased(wp_ref[0])
        lo = lo8.astype(jnp.bfloat16)
        hi = hi8.astype(jnp.bfloat16)
        corr = 8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[:, 0, :] += jnp.dot(
            x, lo, preferred_element_type=jnp.float32) - corr
        acc_ref[:, 1, :] += jnp.dot(
            x, hi, preferred_element_type=jnp.float32) - corr
    else:
        lo, hi = _unpack_block_bf16(wp_ref[0])
        acc_ref[:, 0, :] += jnp.dot(x, lo, preferred_element_type=jnp.float32)
        acc_ref[:, 1, :] += jnp.dot(x, hi, preferred_element_type=jnp.float32)

    @pl.when(k == nsteps_k - 1)
    def _():
        out_ref[...] = (acc_ref[...] * scale_ref[...].astype(jnp.float32)
                        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "out_dtype", "interpret"))
def w4_matmul_paired_stacked(x, wp_all, scale2, layer, *,
                             block_m: int | None = None,
                             block_n: int | None = None,
                             block_k: int | None = None,
                             out_dtype=None,
                             interpret: bool | None = None):
    """Weight-only W4 matmul against layer `layer` of stacked weights
    (L, K, Nh) without slicing them (scalar-prefetch index; see
    w4a4_matmul_paired_stacked).  scale2: (2, Nh) this layer's paired
    scales.  Returns plane-paired (M, 2, Nh)."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    M, K = x.shape
    L, Kw, Nh = wp_all.shape
    assert K == Kw

    bm, bn, bk = _decode_blocks(M, K, Nh, block_m, block_n, block_k)
    bn = _divisor_block(Nh, bn)
    bk = _divisor_block(K, bk)
    pm = (-M) % bm
    if pm:
        x = jnp.pad(x, ((0, pm), (0, 0)))
    Mp = x.shape[0]
    nk = K // bk

    grid = (Mp // bm, Nh // bn, nk)
    out3 = pl.pallas_call(
        functools.partial(_w4_kernel_pref, nsteps_k=nk, biased=bk % 4 == 0),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k, idx: (i, k)),
                pl.BlockSpec((1, bk, bn),
                             lambda i, j, k, idx: (idx[0], k, j)),
                pl.BlockSpec((2, bn), lambda i, j, k, idx: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, 2, bn),
                                   lambda i, j, k, idx: (i, 0, j)),
            scratch_shapes=[pltpu.VMEM((bm, 2, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, 2, Nh), out_dtype or x.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, wp_all, scale2)
    return out3[:M]


def _w4_affine_kernel_pref(idx_ref, x_ref, xsum_ref, wp_ref, sh_ref, out_ref,
                           acc_ref, *, nsteps_k, zero, biased):
    """Scalar-prefetch affine (E8P re-encoded) kernel over stacked weights;
    sh_ref is the (L,) per-layer scalar scale vector in SMEM."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if biased:
        lo8, hi8 = _unpack_block_i8_biased(wp_ref[0])
        lo = lo8.astype(jnp.bfloat16)
        hi = hi8.astype(jnp.bfloat16)
        corr = 8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[:, 0, :] += jnp.dot(
            x, lo, preferred_element_type=jnp.float32) - corr
        acc_ref[:, 1, :] += jnp.dot(
            x, hi, preferred_element_type=jnp.float32) - corr
    else:
        lo, hi = _unpack_block_bf16(wp_ref[0])
        acc_ref[:, 0, :] += jnp.dot(x, lo, preferred_element_type=jnp.float32)
        acc_ref[:, 1, :] += jnp.dot(x, hi, preferred_element_type=jnp.float32)

    @pl.when(k == nsteps_k - 1)
    def _():
        sh = sh_ref[idx_ref[0]]
        corr = zero * xsum_ref[...][:, :, None]
        out_ref[...] = ((acc_ref[...] + corr) * sh).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("zero", "block_m", "block_n",
                                             "block_k", "plane_major",
                                             "out_dtype", "interpret"))
def w4_affine_matmul_stacked(x, wp_all, sh_all, layer, *, zero: float = 0.5,
                             block_m: int | None = None,
                             block_n: int | None = None,
                             block_k: int | None = None,
                             plane_major: bool = False,
                             out_dtype=None,
                             interpret: bool | None = None):
    """w4_affine_matmul against layer `layer` of stacked (L, K, Nh) weights
    + (L,) per-layer scalar scales, copy-free (scalar-prefetch index)."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    M, K = x.shape
    L, Kw, Nh = wp_all.shape
    assert K == Kw
    xsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)

    bm, bn, bk = _decode_blocks(M, K, Nh, block_m, block_n, block_k)
    bn = _divisor_block(Nh, bn)
    bk = _divisor_block(K, bk)
    pm = (-M) % bm
    if pm:
        x = jnp.pad(x, ((0, pm), (0, 0)))
        xsum = jnp.pad(xsum, ((0, pm), (0, 0)))
    Mp = x.shape[0]
    nk = K // bk

    grid = (Mp // bm, Nh // bn, nk)
    out3 = pl.pallas_call(
        functools.partial(_w4_affine_kernel_pref, nsteps_k=nk, zero=zero,
                          biased=bk % 4 == 0),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k, idx: (i, k)),
                pl.BlockSpec((bm, 1), lambda i, j, k, idx: (i, 0)),
                pl.BlockSpec((1, bk, bn),
                             lambda i, j, k, idx: (idx[0], k, j)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((bm, 2, bn),
                                   lambda i, j, k, idx: (i, 0, j)),
            scratch_shapes=[pltpu.VMEM((bm, 2, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, 2, Nh), out_dtype or x.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, xsum, wp_all,
      jnp.asarray(sh_all, jnp.float32).reshape(-1))
    if plane_major:
        y = out3.reshape(out3.shape[0], 2 * Nh)
    else:
        y = unpair_outputs(out3[:, :, :Nh])
    return y[:M]


def _w16_kernel_pref(idx_ref, x_ref, w_ref, out_ref, acc_ref, *, nsteps_k):
    """Scalar-prefetch DENSE bf16 matmul over stacked (L, K, N) weights —
    the 16-bit twin of _w4a4_kernel_i8_pref, used by the bf16 serving path
    so the decode layer loop never slices (= copies) a weight matrix."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(x_ref[...], w_ref[0],
                            preferred_element_type=jnp.float32)

    @pl.when(k == nsteps_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "out_dtype", "interpret"))
def w16_matmul_stacked(x, w_all, layer, *, block_m: int | None = None,
                       block_n: int | None = None,
                       block_k: int | None = None,
                       out_dtype=None,
                       interpret: bool | None = None):
    """y = x @ w_all[layer] for stacked DENSE (L, K, N) 16-bit weights,
    copy-free (the layer index is a scalar-prefetch operand; a w_all[layer]
    slice feeding a dot costs a full per-layer HBM relayout copy under the
    decode loop — measured 1.26 ms/layer vs the 0.55 ms bf16 weight-read
    floor on the r3 baseline).  x: (M, K) bf16."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    M, K = x.shape
    L, Kw, N = w_all.shape
    assert K == Kw
    out_dtype = out_dtype or x.dtype

    # bf16 tiles are 2x the packed-int4 bytes: decode keeps the wide-N
    # streaming shape but halves K (2 MB double-buffered window); prefill
    # keeps MXU-balanced tiles
    bm = min(block_m or 128, _round_up(M, 16))
    decode = M <= 32
    bn = _divisor_block(N, block_n or (2048 if decode else 256))
    bk = _divisor_block(K, block_k or (512 if decode else 512))
    if w_all.dtype != x.dtype:
        # mixed-precision operands don't lower cleanly; cast the small side
        x = x.astype(w_all.dtype)
    pm = (-M) % bm
    if pm:
        x = jnp.pad(x, ((0, pm), (0, 0)))
    Mp = x.shape[0]
    nk = K // bk

    grid = (Mp // bm, N // bn, nk)
    out = pl.pallas_call(
        functools.partial(_w16_kernel_pref, nsteps_k=nk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k, idx: (i, k)),
                pl.BlockSpec((1, bk, bn),
                             lambda i, j, k, idx: (idx[0], k, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, idx: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, w_all)
    return out[:M]


def _w8_kernel(x_ref, w_ref, scale_ref, out_ref, acc_ref, *, nsteps_k):
    """Weight-only INT8 matmul: int8 weight tiles convert to bf16 in VMEM
    (HBM reads stay 1 byte/weight), per-output-channel scale epilogue.
    Built for the lm_head: its bf16 read is 1.05 GB = 24% of the decode
    step's memory floor (BENCHMARKS r3 §1); int8 halves it."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jnp.dot(x_ref[...], w,
                            preferred_element_type=jnp.float32)

    @pl.when(k == nsteps_k - 1)
    def _():
        out_ref[...] = (acc_ref[...]
                        * scale_ref[...].astype(jnp.float32)
                        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "out_dtype", "interpret"))
def w8_matmul(x, w8, scale, *, block_m: int | None = None,
              block_n: int | None = None, block_k: int | None = None,
              out_dtype=None, interpret: bool | None = None):
    """y = (x @ w8) * scale for DENSE int8 weights (K, N) with per-channel
    f32 scales (N,).  x: (M, K) bf16."""
    from rsq_tpu.kernels import default_interpret
    interpret = default_interpret(interpret)
    M, K = x.shape
    Kw, N = w8.shape
    assert K == Kw
    out_dtype = out_dtype or x.dtype

    bm = min(block_m or 128, _round_up(M, 16))
    decode = M <= 32
    bn = _divisor_block(N, block_n or (2048 if decode else 512))
    # decode default bk 2048: at the lm_head shape (4096, 128256) bn lands
    # on 768 (128256 = 2^8*3*167), and bk 512 makes 1336 grid steps of
    # 0.4 MB — grid-overhead-bound; 2048 quarters the step count
    bk = _divisor_block(K, block_k or (2048 if decode else 512))
    pm = (-M) % bm
    if pm:
        x = jnp.pad(x, ((0, pm), (0, 0)))
    Mp = x.shape[0]
    nk = K // bk

    grid = (Mp // bm, N // bn, nk)
    out = pl.pallas_call(
        functools.partial(_w8_kernel, nsteps_k=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w8, scale.reshape(1, N))
    return out[:M]


def w8_quantize(w, axis: int = 0):
    """Per-output-channel symmetric int8 quantization of a dense (K, N)
    matrix (axis = reduction axis).  Returns (w8 int8, scale (N,) f32)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return w8.astype(jnp.int8), scale.astype(jnp.float32)


def w8_matmul_reference(x, w8, scale):
    return (x.astype(jnp.float32) @ w8.astype(jnp.float32)
            * scale.astype(jnp.float32)[None, :]).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "clip_ratio", "decode",
                                             "interpret", "mxu_int8"))
def w4a4_matmul(x, w_packed, scale, token_scale=None, *,
                clip_ratio: float = 1.0,
                block_m: int | None = None, block_n: int | None = None,
                block_k: int | None = None, decode: bool | None = None,
                mxu_int8: bool | None = None,
                interpret: bool | None = None):
    """Per-token int4 activation quant + int4 weight matmul + dequant.

    x: (M, K); w_packed: uint8 (K, N/2) planar; scale: (N,).
    Activation scale = absmax/7 * clip_ratio per token (nn/quantization.py:4-13),
    or an explicit `token_scale` (M, 1) — used under tensor parallelism where
    the per-token absmax must be a global (pmax) reduction over shards.
    """
    out3 = w4a4_matmul_paired(
        x, w_packed, pair_scales(scale), token_scale, clip_ratio=clip_ratio,
        block_m=block_m, block_n=block_n, block_k=block_k, decode=decode,
        mxu_int8=mxu_int8, interpret=interpret)
    return unpair_outputs(out3)


def w4a4_matmul_reference(x, w_packed, scale, clip_ratio: float = 1.0):
    """Pure-jnp oracle: quantize per token, int matmul, dual-scale dequant."""
    xf = jnp.asarray(x, jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    xs = jnp.where(absmax == 0, 1.0, absmax * clip_ratio / 7.0)
    xq = jnp.clip(jnp.round(xf / xs), -8, 7)
    wq = unpack_w4_planar(w_packed).astype(jnp.float32)
    acc = xq @ wq
    return (acc * xs * scale[None, :]).astype(x.dtype)
