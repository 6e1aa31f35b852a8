"""GPTQ on TPU: Hessian accumulation and the blocked column solver.

Re-derives the reference engine (fake_quant/gptq_utils.py) in a form XLA
compiles well:

- Hessian: the reference's running update (`GPTQ.add_batch`,
  gptq_utils.py:111-130) telescopes to the closed form
      H = (2/N) * sum_j X_j^T diag(w_j / mean(w_j)) X_j
  which we evaluate as a jitted scan over samples (f32 accumulator).
- Solver: the reference's per-column Python loop with in-place slices
  (`fasterquant`, gptq_utils.py:187-222) becomes ONE jit: a lax.scan over
  column blocks, each block running a 128-step fori_loop (static shapes,
  column masking instead of shrinking slices) followed by a single
  full-width MXU GEMM for cross-block error propagation.  Identical math,
  no per-block recompilation, no host round trips.
- Damping: damp = percdamp * mean(diag H); `add_until_fail` retries with
  cumulative damping on the host, checking for NaN/Inf instead of relying
  on exceptions (gptq_utils.py:164-185).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rsq_tpu.core.quant import (
    WeightQuantConfig, minq_maxq, weight_quant_params,
    sym_quant_dequant, asym_quant_dequant)

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Hessian accumulation
# ---------------------------------------------------------------------------

@jax.jit
def _hessian_step(H, x, w):
    """One sample's contribution: x (L, d) f32, w (L,) normalized weights."""
    xw = x * jnp.sqrt(w)[:, None]
    return H + jnp.einsum("ld,le->de", xw, xw,
                          preferred_element_type=jnp.float32)


def hessian_from_inputs(xs, weighting=None, chunk: int = 8):
    """H = (2/N) sum_j X_j^T diag(w_j) X_j over samples.

    xs: (N, L, d) or list of (L, d); weighting: (N, L) or None.  Per-sample
    weights are normalized to mean 1 first (gptq_utils.py:124-127).
    Accumulates in f32 on device.
    """
    if isinstance(xs, (list, tuple)):
        n = len(xs)
        d = xs[0].shape[-1]
    else:
        n = xs.shape[0]
        d = xs.shape[-1]
    H = jnp.zeros((d, d), jnp.float32)
    for j in range(n):
        x = jnp.asarray(xs[j], jnp.float32)
        if weighting is not None:
            w = jnp.asarray(weighting[j], jnp.float32)
            w = w / jnp.mean(w)
        else:
            w = jnp.ones((x.shape[0],), jnp.float32)
        H = _hessian_step(H, x, w)
    return H * (2.0 / n)


# ---------------------------------------------------------------------------
# Cholesky chain with damping retry
# ---------------------------------------------------------------------------

def _inv_cholesky_upper(H, block: int = 2048):
    """U upper-triangular with H^-1 = U^T U (the torch
    cholesky->cholesky_inverse->cholesky(upper) chain, gptq_utils.py:172-183).

    The inverse goes through COLUMN-BLOCKED triangular solves: XLA:TPU's
    TriangularSolve with a full (n, n) RHS compiles a 41 GB program at the
    Llama-3 intermediate size n=14336 (measured: permanent HBM compile
    OOM), while n x 2048 solves compile and run fine — so L^-1 is built
    block by block and H^-1 = (L^-1)^T L^-1 is one MXU matmul."""
    n = H.shape[0]
    L = jnp.linalg.cholesky(H)
    if n <= 4096:
        Hinv = jax.scipy.linalg.cho_solve(
            (L, True), jnp.eye(n, dtype=H.dtype))
    else:
        cols = []
        for j in range(0, n, block):
            nb = min(block, n - j)
            rhs = jnp.zeros((n, nb), H.dtype).at[j:j + nb].set(
                jnp.eye(nb, dtype=H.dtype))
            cols.append(jax.scipy.linalg.solve_triangular(L, rhs,
                                                          lower=True))
        Linv = jnp.concatenate(cols, axis=1)    # L^{-1}
        Hinv = Linv.T @ Linv
    C = jnp.linalg.cholesky(Hinv)
    return C.T


# One jitted program for the whole chain with the (fresh, per-try) input
# DONATED: eager per-op execution keeps H + L + all solve outputs + the
# concat + Hinv alive simultaneously and tips the 14336-dim chain over
# HBM next to the streamed layer state; inside one jit XLA's buffer plan
# reuses the donated input and intermediate buffers.
_inv_cholesky_upper_jit = functools.partial(
    jax.jit, static_argnames=("block",), donate_argnums=(0,))(
        _inv_cholesky_upper)


def prepare_hinv(H, percdamp: float = 0.01, add_until_fail: bool = False,
                 max_tries: int = 50):
    """Dead-column handling + damping + inverse Cholesky factor.

    Returns (U, dead) where dead marks zero-diagonal columns (weights there
    are zeroed by the solver, gptq_utils.py:142-145).
    """
    H = jnp.asarray(H, jnp.float32)
    diag = jnp.diag(H)
    dead = diag == 0
    H = H.at[jnp.diag_indices_from(H)].set(jnp.where(dead, 1.0, diag))
    damp = percdamp * jnp.mean(jnp.diag(H))

    tries = max_tries if add_until_fail else 1
    for k in range(1, tries + 1):
        # fresh damped copy per try so the jitted chain can DONATE it
        Htry = H.at[jnp.diag_indices_from(H)].add(k * damp)
        U = _inv_cholesky_upper_jit(Htry)
        if bool(jnp.all(jnp.isfinite(U))):
            if k > 1:
                logger.warning("cholesky needed %d extra dampings", k)
            return U, dead
    raise FloatingPointError("cholesky failed even with extra damping")


# ---------------------------------------------------------------------------
# Blocked solver
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GPTQConfig:
    blocksize: int = 128
    groupsize: int = -1
    actorder: bool = False
    percdamp: float = 0.01
    add_until_fail: bool = False


def _quant_dq(w_col, scale, zero, cfg: WeightQuantConfig):
    """Quantize-dequantize one column (rows,) with per-row params."""
    if cfg.nf:
        from rsq_tpu.core.nf import nf_quant_dequant
        return nf_quant_dequant(w_col, cfg.bits, scale)
    _, maxq = minq_maxq(cfg.bits, cfg.sym)
    if cfg.sym:
        return sym_quant_dequant(w_col, scale, maxq)
    return asym_quant_dequant(w_col, scale, zero, maxq)


@partial(jax.jit, static_argnames=("wq", "blocksize", "groupsize"))
def _gptq_solve(W, U, scale0, zero0, wq: WeightQuantConfig,
                blocksize: int, groupsize: int):
    """Core solve. W: (rows, cols) f32 (cols padded to blocksize), U: the
    upper factor of H^-1. Returns (Q, losses, scale, zero) with Q the
    dequantized weights. Group scales are re-estimated from the
    error-compensated residual every `groupsize` columns, matching
    dynamic (non-static) groups in the reference (gptq_utils.py:201-204)."""
    rows, cols = W.shape
    nblocks = cols // blocksize
    col_idx = jnp.arange(cols)

    def block_step(carry, b):
        W, scale, zero = carry
        i1 = b * blocksize
        W1 = jax.lax.dynamic_slice(W, (0, i1), (rows, blocksize))
        U1 = jax.lax.dynamic_slice(U, (i1, i1), (blocksize, blocksize))

        W1_start = W1  # block-start values (cross-block updates applied)

        def col_step(i, st):
            W1, Q1, Err1, L1, scale, zero = st
            w = jax.lax.dynamic_slice(W1, (0, i), (rows, 1))[:, 0]
            d = U1[i, i]
            if groupsize > 0:
                def refresh(sz):
                    # the reference re-estimates group params from W as of
                    # BLOCK START — its full W receives in-block updates only
                    # at block end (fasterquant: find_params(W[...]) at :204,
                    # W1-only updates at :216)
                    grp = jax.lax.dynamic_slice(W1_start, (0, i),
                                                (rows, groupsize))
                    s, z = weight_quant_params(grp, wq)
                    return s[:, 0], z[:, 0]
                scale, zero = jax.lax.cond(
                    (i1 + i) % groupsize == 0, refresh,
                    lambda sz: sz, (scale, zero))
            q = _quant_dq(w, scale, zero, wq)
            err = (w - q) / d
            # subtract err * U1[i, i:] from in-block columns >= i
            urow = jnp.where(jnp.arange(blocksize) >= i, U1[i, :], 0.0)
            W1 = W1 - err[:, None] * urow[None, :]
            Q1 = Q1.at[:, i].set(q)
            Err1 = Err1.at[:, i].set(err)
            L1 = L1.at[:, i].set((w - q) ** 2 / d ** 2)
            return (W1, Q1, Err1, L1, scale, zero)

        init = (W1, jnp.zeros_like(W1), jnp.zeros_like(W1),
                jnp.zeros_like(W1), scale, zero)
        W1, Q1, Err1, L1, scale, zero = jax.lax.fori_loop(
            0, blocksize, col_step, init)

        # cross-block propagation: only columns >= i1+blocksize change
        Urows = jax.lax.dynamic_slice(U, (i1, 0), (blocksize, cols))
        Urows = jnp.where(col_idx[None, :] >= i1 + blocksize, Urows, 0.0)
        W = W - Err1 @ Urows
        return (W, scale, zero), (Q1, L1 / 2.0)

    if groupsize > 0:
        # group scales are produced inside the loop
        scale_init = jnp.ones((rows,), jnp.float32)
        zero_init = jnp.zeros((rows,), jnp.float32)
    else:
        scale_init, zero_init = scale0, zero0

    (_, scale, zero), (Qb, Lb) = jax.lax.scan(
        block_step, (W, scale_init, zero_init), jnp.arange(nblocks))
    # (nblocks, rows, blocksize) -> (rows, cols)
    Q = jnp.moveaxis(Qb, 0, 1).reshape(rows, cols)
    losses = jnp.moveaxis(Lb, 0, 1).reshape(rows, cols)
    return Q, losses, scale, zero


def gptq_quantize(W, H, wq: WeightQuantConfig, cfg: GPTQConfig = GPTQConfig()):
    """Quantize W (out_features, in_features) against Hessian H (in, in).

    Returns (Q, info) where Q is the dequantized weight (same layout/dtype
    as W) and info carries {scale, zero, losses}.  Mirrors `fasterquant`
    (gptq_utils.py:132-234) including act-order and dynamic groups.
    """
    orig_dtype = W.dtype
    rows, cols = W.shape
    Wf = jnp.asarray(W, jnp.float32)

    # initial params from the full weight BEFORE dead-column zeroing, as the
    # reference does (fasterquant: find_params at :138-139, dead at :142-144);
    # per-row params are invariant to the act-order column permutation.
    if cfg.groupsize <= 0:
        scale, zero = weight_quant_params(Wf, wq)
        scale0, zero0 = scale[:, 0], zero[:, 0]
    else:
        scale0 = jnp.ones((rows,), jnp.float32)
        zero0 = jnp.zeros((rows,), jnp.float32)

    U, dead = prepare_hinv(H, cfg.percdamp, cfg.add_until_fail)
    Wf = jnp.where(dead[None, :], 0.0, Wf)

    perm = invperm = None
    if cfg.actorder:
        perm = jnp.argsort(-jnp.diag(jnp.asarray(H, jnp.float32)))
        invperm = jnp.argsort(perm)
        Wf = Wf[:, perm]
        Hp = jnp.asarray(H, jnp.float32)[perm][:, perm]
        U, _ = prepare_hinv(Hp, cfg.percdamp, cfg.add_until_fail)

    # pad cols to a multiple of blocksize (identity-extend U)
    pad = (-cols) % cfg.blocksize
    if pad:
        Wf = jnp.pad(Wf, ((0, 0), (0, pad)))
        U = jnp.pad(U, ((0, 0), (0, pad)))
        U = jnp.pad(U, ((0, pad), (0, 0)))
        U = U.at[jnp.arange(cols, cols + pad), jnp.arange(cols, cols + pad)].set(1.0)

    Q, losses, scale, zero = _gptq_solve(
        Wf, U, scale0, zero0, wq, cfg.blocksize, cfg.groupsize)
    Q = Q[:, :cols]
    losses = losses[:, :cols]

    if cfg.actorder:
        Q = Q[:, invperm]
        losses = losses[:, invperm]

    if not bool(jnp.all(jnp.isfinite(Q))):
        raise ValueError("NaN in quantized weights")
    info = {"scale": scale, "zero": zero, "losses": losses}
    return Q.astype(orig_dtype), info


def rtn_quantize(W, wq: WeightQuantConfig):
    """Round-to-nearest fallback (rtn_fwrd, gptq_utils.py:684-724)."""
    from rsq_tpu.core.quant import weight_fake_quant
    scale, zero = weight_quant_params(W, wq)
    return weight_fake_quant(W, scale, zero, wq), {"scale": scale, "zero": zero}


def quant_error(W, Q, H):
    """tr((W-Q) H (W-Q)^T) — the objective GPTQ minimizes; used in tests and
    layer diagnostics."""
    E = jnp.asarray(W - Q, jnp.float32)
    return float(jnp.einsum("rc,cd,rd->", E, jnp.asarray(H, jnp.float32), E))
