"""Quantizer primitives as pure jnp functions.

Covers the numerics of the reference's quantizer stack
(fake_quant/quant_utils.py: sym/asym quant-dequant :80-106, int4 pack/unpack
:114-147, per-token activation quantization `ActQuantizer.find_params`
:190-247, GPTQ `WeightQuantizer` per-channel minmax + MSE grid-shrink clip
search :329-431) re-designed as stateless functions over arrays so that every
step jits and fuses on TPU.  Scales/zeros are explicit values, not module
state; "configure" becomes small frozen dataclasses.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Ranges
# ---------------------------------------------------------------------------

def minq_maxq(bits: int, sym: bool) -> tuple[int, int]:
    """Integer grid endpoints. Symmetric grids are two's-complement style:
    [-2^(b-1), 2^(b-1)-1]; asymmetric are [0, 2^b - 1]."""
    if sym:
        maxq = 2 ** (bits - 1) - 1
        return -maxq - 1, maxq
    return 0, 2 ** bits - 1


# ---------------------------------------------------------------------------
# Elementwise quant / dequant
# ---------------------------------------------------------------------------

def sym_quant(x, scale, maxq):
    """Round-to-nearest onto the symmetric grid; returns float-valued ints."""
    return jnp.clip(jnp.round(x / scale), -(maxq + 1), maxq)


def sym_dequant(q, scale):
    return scale * q


def sym_quant_dequant(x, scale, maxq):
    return sym_dequant(sym_quant(x, scale, maxq), scale)


def asym_quant(x, scale, zero, maxq):
    return jnp.clip(jnp.round(x / scale) + zero, 0, maxq)


def asym_dequant(q, scale, zero):
    return scale * (q - zero)


def asym_quant_dequant(x, scale, zero, maxq):
    return asym_dequant(asym_quant(x, scale, zero, maxq), scale, zero)


# ---------------------------------------------------------------------------
# INT4 packing: two int4 values per int8 lane.
# Low nibble holds the even index, high nibble the odd index (matches the
# layout the Pallas kernels unpack).
# ---------------------------------------------------------------------------

def pack_int4(q) -> jax.Array:
    """Pack signed int4 values (given in any int dtype, range [-8, 7]) along
    the last axis into uint8 pairs. Last dim must be even."""
    q = q.astype(jnp.int8)
    u = jnp.where(q < 0, q + 16, q).astype(jnp.uint8)
    lo = u[..., 0::2]
    hi = u[..., 1::2]
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_int4(p) -> jax.Array:
    """Inverse of pack_int4; returns int8 in [-8, 7]."""
    lo = (p & 0x0F).astype(jnp.int8)
    hi = ((p >> 4) & 0x0F).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(*p.shape[:-1], p.shape[-1] * 2)


# ---------------------------------------------------------------------------
# Activation quantization (per-token / per-token-groupwise), runtime scales.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ActQuantConfig:
    """Static configuration for one activation-quantization site.

    Mirrors ActQuantizer.configure (quant_utils.py:182-188): bits==16 is a
    no-op; groupsize -1 means per-token over the full feature dim.
    """
    bits: int = 16
    sym: bool = True
    groupsize: int = -1
    clip_ratio: float = 1.0

    @property
    def enabled(self) -> bool:
        return self.bits < 16


def act_quant_params(x, cfg: ActQuantConfig):
    """Compute per-token (or per-token-group) scale/zero for `x`.

    x: (..., d). Returns (scale, zero) broadcastable against x's group shape:
    per-token -> (..., 1); groupwise -> (..., d//g, 1) after reshape.
    Matches ActQuantizer.find_params / find_params_per_token_groupwise:
    min is clamped to <=0 and max to >=0 in the per-token path; zero rows get
    scale 1 (sym) or the [-1, 1] fallback (asym).
    """
    _, maxq = minq_maxq(cfg.bits, cfg.sym)
    maxq = jnp.asarray(maxq, dtype=jnp.float32)
    xf = x.astype(jnp.float32)
    if cfg.groupsize > 0:
        xf = xf.reshape(*x.shape[:-1], x.shape[-1] // cfg.groupsize, cfg.groupsize)
        xmax = jnp.max(xf, axis=-1, keepdims=True) * cfg.clip_ratio
        xmin = jnp.min(xf, axis=-1, keepdims=True) * cfg.clip_ratio
    else:
        xmax = jnp.maximum(jnp.max(xf, axis=-1, keepdims=True), 0.0) * cfg.clip_ratio
        xmin = jnp.minimum(jnp.min(xf, axis=-1, keepdims=True), 0.0) * cfg.clip_ratio
    if cfg.sym:
        xabs = jnp.maximum(jnp.abs(xmin), xmax)
        scale = jnp.where(xabs == 0, 1.0, xabs / maxq)
        zero = jnp.zeros_like(scale)
    else:
        degenerate = (xmin == 0) & (xmax == 0)
        xmin = jnp.where(degenerate, -1.0, xmin)
        xmax = jnp.where(degenerate, 1.0, xmax)
        scale = (xmax - xmin) / maxq
        zero = jnp.round(-xmin / scale)
    return scale, zero


def act_fake_quant(x, cfg: ActQuantConfig):
    """Quantize-dequantize activations with runtime per-token scales."""
    if not cfg.enabled:
        return x
    _, maxq = minq_maxq(cfg.bits, cfg.sym)
    scale, zero = act_quant_params(x, cfg)
    xf = x.astype(jnp.float32)
    if cfg.groupsize > 0:
        shaped = xf.reshape(*x.shape[:-1], x.shape[-1] // cfg.groupsize, cfg.groupsize)
        if cfg.sym:
            y = sym_quant_dequant(shaped, scale, maxq)
        else:
            y = asym_quant_dequant(shaped, scale, zero, maxq)
        y = y.reshape(x.shape)
    else:
        if cfg.sym:
            y = sym_quant_dequant(xf, scale, maxq)
        else:
            y = asym_quant_dequant(xf, scale, zero, maxq)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Weight quantization: per-channel minmax + optional MSE grid-shrink search.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class WeightQuantConfig:
    """Static configuration for weight quantization of one linear.

    Mirrors WeightQuantizer.configure defaults (quant_utils.py:338-359):
    mse=clip search with norm 2.4 over an 80-point shrink grid.
    """
    bits: int = 4
    sym: bool = True
    perchannel: bool = True
    mse: bool = False
    norm: float = 2.4
    grid: int = 100
    maxshrink: float = 0.8
    nf: bool = False   # NormalFloat codebook instead of uniform grid

    @property
    def enabled(self) -> bool:
        return self.bits < 16


@partial(jax.jit, static_argnames=("cfg",))
def weight_quant_params(W, cfg: WeightQuantConfig):
    """Find per-output-channel (row) scale/zero for weight matrix W (rows, cols).

    Returns (scale, zero) of shape (rows, 1).  With cfg.mse, runs the
    grid-shrink clip search: p = 1 - i/grid for i in [0, maxshrink*grid),
    scoring sum |qdq(W)-W|^norm per row and keeping the best shrink
    (quant_utils.py:393-421).  The search runs as a fori_loop so only one
    candidate quant-dequant is materialized at a time.
    """
    _, maxq_i = minq_maxq(cfg.bits, cfg.sym)
    maxq = jnp.asarray(maxq_i, dtype=jnp.float32)
    Wf = W.astype(jnp.float32)
    if not cfg.perchannel:
        Wf = Wf.reshape(1, -1)
    rows = Wf.shape[0]

    zero_f = jnp.zeros((rows,), jnp.float32)
    xmin = jnp.minimum(jnp.min(Wf, axis=1), zero_f)
    xmax = jnp.maximum(jnp.max(Wf, axis=1), zero_f)

    def params_from_range(lo, hi):
        if cfg.nf:
            from rsq_tpu.core.nf import grid_max
            amax = jnp.clip(jnp.maximum(jnp.abs(lo), hi), min=1e-5)
            return amax / grid_max(cfg.bits), jnp.zeros_like(amax)
        if cfg.sym:
            amax = jnp.clip(jnp.maximum(jnp.abs(lo), hi), min=1e-5)
            return amax / maxq, jnp.zeros_like(amax)
        degenerate = (lo == 0) & (hi == 0)
        lo = jnp.where(degenerate, -1.0, lo)
        hi = jnp.where(degenerate, 1.0, hi)
        scale = jnp.clip(hi - lo, min=1e-5) / maxq
        return scale, jnp.round(-lo / scale)

    scale, zero = params_from_range(xmin, xmax)

    if cfg.mse:
        def body(i, carry):
            best, scale, zero = carry
            p = 1.0 - i.astype(jnp.float32) / cfg.grid
            s1, z1 = params_from_range(p * xmin, p * xmax)
            if cfg.nf:
                from rsq_tpu.core.nf import nf_quant_dequant
                q = nf_quant_dequant(Wf, cfg.bits, s1[:, None])
            elif cfg.sym:
                q = sym_quant_dequant(Wf, s1[:, None], maxq)
            else:
                q = asym_quant_dequant(Wf, s1[:, None], z1[:, None], maxq)
            err = jnp.sum(jnp.abs(q - Wf) ** cfg.norm, axis=1)
            better = err < best
            return (jnp.where(better, err, best),
                    jnp.where(better, s1, scale),
                    jnp.where(better, z1, zero))

        best0 = jnp.full((rows,), jnp.inf, jnp.float32)
        _, scale, zero = jax.lax.fori_loop(
            0, int(cfg.maxshrink * cfg.grid), body, (best0, scale, zero))

    if not cfg.perchannel:
        scale = jnp.broadcast_to(scale, (W.shape[0],))
        zero = jnp.broadcast_to(zero, (W.shape[0],))
    return scale[:, None], zero[:, None]


def weight_fake_quant(W, scale, zero, cfg: WeightQuantConfig):
    """Quantize-dequantize W with fixed per-row params."""
    if not cfg.enabled:
        return W
    _, maxq = minq_maxq(cfg.bits, cfg.sym)
    Wf = W.astype(jnp.float32)
    if cfg.nf:
        from rsq_tpu.core.nf import nf_quant_dequant
        return nf_quant_dequant(Wf, cfg.bits, scale).astype(W.dtype)
    if cfg.sym:
        y = sym_quant_dequant(Wf, scale, maxq)
    else:
        y = asym_quant_dequant(Wf, scale, zero, maxq)
    return y.astype(W.dtype)


def weight_quantize_store(W, scale, zero, cfg: WeightQuantConfig):
    """Quantize W to integer codes for storage/serving. Returns int8 codes
    (symmetric, zero-centered) or uint-style codes for asymmetric grids."""
    _, maxq = minq_maxq(cfg.bits, cfg.sym)
    Wf = W.astype(jnp.float32)
    if cfg.sym:
        q = sym_quant(Wf, scale, maxq)
    else:
        q = asym_quant(Wf, scale, zero, maxq)
    return q.astype(jnp.int8)
