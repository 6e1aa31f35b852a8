"""LDLQ adaptive rounding with the E8P lattice codebook (2-bit path).

Re-implementation of the reference's QuIP#-derived 2-bit quantizer
(fake_quant/ldlq_utils.py): the E8P codebook is 2^16 8-dim points built from
the E8 lattice (D8 "abs grid" of even-sum half-integer vectors with norm^2
<= 10 plus 29 norm-12 vectors, expanded by sign patterns with a parity bit
and a +-1/4 coset shift; ldlq_utils.py:23-113), and weights are rounded
8 columns at a time right-to-left through a block-LDL factorization of the
Hessian with `quip_tune_iters` refinement sweeps (ldlq_utils.py:281-320).

TPU design: codebook construction is host numpy (one-time); the rounding
scan is a jitted lax.fori_loop whose inner step is one (rows, 8) x
(|grid|, 8) MXU matmul nearest-neighbor search; the cross-column error
propagation (W - hatW) @ L is a masked full-width GEMM like the GPTQ
solver's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CODESZ = 8
_E8P_SCALE = 1.03


# ---------------------------------------------------------------------------
# Codebook construction (host, one-time)
# ---------------------------------------------------------------------------

def _norm12() -> np.ndarray:
    """The 29 norm-12 E8+1/4 representatives (ldlq_utils.py:23-55): all
    sign-permutation classes |v| in {1/2, 3/2}^8 with six 3/2's arranged as
    the reference enumerates them."""
    rows = [
        [3, 1, 1, 1, 3, 3, 3, 3], [1, 3, 1, 1, 3, 3, 3, 3],
        [1, 1, 3, 1, 3, 3, 3, 3], [1, 1, 1, 3, 3, 3, 3, 3],
        [3, 3, 3, 1, 3, 3, 1, 1], [3, 3, 3, 1, 3, 1, 3, 1],
        [3, 3, 3, 1, 1, 3, 3, 1], [3, 3, 3, 1, 3, 1, 1, 3],
        [3, 3, 3, 1, 1, 3, 1, 3], [3, 3, 3, 1, 1, 1, 3, 3],
        [3, 3, 1, 3, 3, 3, 1, 1], [3, 3, 1, 3, 3, 1, 3, 1],
        [3, 3, 1, 3, 1, 3, 3, 1], [3, 3, 1, 3, 3, 1, 1, 3],
        [3, 3, 1, 3, 1, 3, 1, 3], [3, 3, 1, 3, 1, 1, 3, 3],
        [3, 1, 3, 3, 3, 3, 1, 1], [3, 1, 3, 3, 3, 1, 3, 1],
        [3, 1, 3, 3, 1, 3, 3, 1], [3, 1, 3, 3, 3, 1, 1, 3],
        [3, 1, 3, 3, 1, 3, 1, 3], [1, 3, 3, 3, 1, 1, 3, 3],
        [1, 3, 3, 3, 3, 3, 1, 1], [1, 3, 3, 3, 3, 1, 3, 1],
        [1, 3, 3, 3, 1, 3, 3, 1], [1, 3, 3, 3, 3, 1, 1, 3],
        [1, 3, 3, 3, 1, 3, 1, 3], [1, 1, 3, 3, 1, 3, 3, 3],
        [3, 3, 1, 1, 3, 3, 3, 1],
    ]
    return np.asarray(rows, dtype=np.float64) / 2.0


@functools.lru_cache(maxsize=1)
def abs_grid() -> np.ndarray:
    """Unique |.| patterns of D8+1/2 points with even sum and norm^2 <= 10,
    plus the 29 norm-12 rows (ldlq_utils.py:76-84)."""
    rng = np.arange(-4, 4)
    mesh = np.stack(np.meshgrid(*[rng] * CODESZ, indexing="ij"), axis=-1)
    d8 = mesh.reshape(-1, CODESZ).astype(np.float64) + 0.5
    keep = (d8.sum(-1) % 2 == 0) & ((d8 ** 2).sum(-1) <= 10)
    d8abs = np.unique(np.abs(d8[keep]), axis=0)
    return np.concatenate([d8abs, _norm12()], axis=0)


@functools.lru_cache(maxsize=1)
def search_grids():
    """(grid_part, grid_part_norm, part_abs_map, grid_abs_odd) used by the
    fast two-coset nearest-neighbor search (ldlq_utils.py:185-208)."""
    ag = abs_grid()
    # full grid restricted to parity points, shifted +1/4, filtered to the
    # canonical sign region (at most one negative among the first 7, min
    # >= -0.5) — the reference's grid_part (ldlq_utils.py:187-194).
    full, parity = _full_grid()
    gp = full[parity] + 0.25
    sel = ((gp[:, :7] < 0).sum(-1) <= 1) & (gp[:, :7].min(-1) >= -0.5)
    gp = gp[sel]
    gp_norm = (gp ** 2).sum(-1)
    # map each grid_part row to its abs-grid row
    d = 2 * np.abs(gp) @ ag.T - (ag ** 2).sum(-1)[None, :]
    part_abs_map = d.argmax(-1)
    abs_odd = ag.sum(-1) % 2 == 1
    return gp, gp_norm, part_abs_map, abs_odd


@functools.lru_cache(maxsize=1)
def _full_grid():
    """The 2^16-entry synthesized codebook + parity mask
    (ldlq_utils.py:87-113). Vectorized decode of (abs_idx, signs)."""
    ag = abs_grid()  # (227, 8), order matches packed-abs construction
    # packed abs layout: columns permuted [0,2,4,6,1,3,5,7], 8th column sign
    # flipped on odd-sum rows, scaled *2+8 into nibbles
    cba = ag[:, [0, 2, 4, 6, 1, 3, 5, 7]].copy()
    cba[:, 7] *= 1 - 2 * (cba.sum(1) % 2)
    codes = np.arange(1 << 16)
    signs = codes & 255
    absi = codes >> 8
    parity = np.zeros_like(signs)
    for i in range(8):
        parity ^= (signs >> i) & 1
    signs = signs ^ parity
    shuffle = [0, 4, 1, 5, 2, 6, 3, 7]
    vals = np.zeros((1 << 16, 8))
    for i in range(8):
        ii = shuffle[i]
        v = cba[absi, ii]  # decoded magnitude (already +-)
        s = ((signs >> ii) & 1).astype(bool)
        vals[:, i] = np.where(s, -v, v)
    vals += np.where(parity[:, None], -0.25, 0.25)
    return vals, parity.astype(bool)


def e8p_grid() -> np.ndarray:
    return _full_grid()[0]


# ---------------------------------------------------------------------------
# Nearest-codeword search (jnp)
# ---------------------------------------------------------------------------

def _round_to(X, grid, grid_norm):
    """argmax_g 2 X.g - |g|^2 == nearest neighbor. X: (rows, 8)."""
    scores = 2.0 * X @ grid.T - grid_norm[None, :]
    idx = jnp.argmax(scores, axis=-1)
    return grid[idx], idx


def quantize_e8p(X, grids=None):
    """Round rows of X (rows, 8) to the E8P codebook via the two-coset fast
    search (ldlq_utils.py:246-279). Returns (values, uint16 indices)."""
    gp, gp_norm, part_abs_map, abs_odd = grids or _jnp_grids()
    bit_map = 2 ** jnp.arange(8)

    def part(Xs, parity_bit):
        Xa = jnp.abs(Xs)
        odd = (Xs < 0).sum(-1) % 2 != 0
        Xa = Xa.at[:, 7].multiply(jnp.where(odd, -1.0, 1.0))
        mask = 1 - 2 * (Xs < 0).astype(jnp.float32)
        mask = mask.at[:, 7].multiply(jnp.where(odd, -1.0, 1.0))
        rounded, idx = _round_to(Xa, gp, gp_norm)
        vals = rounded * mask
        err = jnp.linalg.norm(Xs - vals, axis=-1)
        absi = part_abs_map[idx]
        sign_mask = ((rounded < 0) ^ (mask < 0))[:, jnp.array([0, 2, 4, 6, 1, 3, 5, 7])]
        sign_mask = sign_mask.at[:, 7].set(sign_mask[:, 7] ^ abs_odd[absi])
        sign_mask = sign_mask.at[:, 0].set(sign_mask[:, 0] ^ parity_bit)
        code = (absi << 8) + (sign_mask * bit_map).sum(-1).astype(jnp.int32)
        return vals, code, err

    vp, ip, ep = part(X + 0.25, True)
    vm, im, em = part(X - 0.25, False)
    which = ep < em
    vals = jnp.where(which[:, None], vp - 0.25, vm + 0.25)
    idx = jnp.where(which, ip, im)
    return vals, idx


@functools.lru_cache(maxsize=1)
def _jnp_grids_np():
    gp, gpn, pam, odd = search_grids()
    return (gp.astype(np.float32), gpn.astype(np.float32),
            pam.astype(np.int32), odd)


def _jnp_grids():
    gp, gpn, pam, odd = _jnp_grids_np()
    return (jnp.asarray(gp), jnp.asarray(gpn), jnp.asarray(pam),
            jnp.asarray(odd))


# ---------------------------------------------------------------------------
# Block-LDL + LDLQ
# ---------------------------------------------------------------------------

def block_ldl(H, b: int, percdamp: float = 0.01, add_until_fail: bool = True,
              max_tries: int = 50):
    """H = L D L^T with unit-block-diagonal L (ldlq_utils.py:116-150).
    Returns (L, D) as host-verified finite arrays; damping retried on NaN."""
    n = H.shape[0]
    m = n // b
    Hj = jnp.asarray(H, jnp.float32)
    damp = percdamp * jnp.mean(jnp.diag(Hj))
    tries = max_tries if add_until_fail else 1
    for _ in range(tries):
        Hj = Hj.at[jnp.diag_indices(n)].add(damp)
        C = jnp.linalg.cholesky(Hj)
        if bool(jnp.all(jnp.isfinite(C))):
            break
    else:
        raise FloatingPointError("block_ldl: cholesky failed")
    DL = jnp.stack([C[i * b:(i + 1) * b, i * b:(i + 1) * b]
                    for i in range(m)])          # (m, b, b)
    D = jnp.einsum("mij,mkj->mik", DL, DL)
    DLinv = jnp.linalg.inv(DL)
    L = C.reshape(n, m, b)
    L = jnp.einsum("nmb,mbc->nmc", L, DLinv).reshape(n, n)
    return L, D


@functools.partial(jax.jit, static_argnames=("quip_tune_iters",))
def _ldlq_scan(Wr, Hr, L, gp, gpn, pam, odd, quip_tune_iters: int = 10):
    rows, n = Wr.shape
    m = n // CODESZ
    grids = (gp, gpn, pam, odd)

    def round_block(X):
        return quantize_e8p(X, grids)

    def backward_pass(hatWr, Qidx, refine: bool):
        def body(t, carry):
            hatWr, Qidx = carry
            k = m - 1 - t
            c0 = k * CODESZ
            if not refine:
                resid = Wr - hatWr
                Lcols = jax.lax.dynamic_slice(L, (0, c0), (n, CODESZ))
                # only rows beyond this block contribute
                rowmask = (jnp.arange(n) >= c0 + CODESZ)[:, None]
                target = (jax.lax.dynamic_slice(Wr, (0, c0), (rows, CODESZ))
                          + resid @ (Lcols * rowmask))
            else:
                resid = Wr - hatWr
                Hcols = jax.lax.dynamic_slice(Hr, (0, c0), (n, CODESZ))
                Hblk = jax.lax.dynamic_slice(Hr, (c0, c0), (CODESZ, CODESZ))
                target = (jax.lax.dynamic_slice(hatWr, (0, c0), (rows, CODESZ))
                          + (resid @ Hcols) @ jnp.linalg.inv(Hblk))
            vals, idx = round_block(target)
            hatWr = jax.lax.dynamic_update_slice(hatWr, vals, (0, c0))
            Qidx = jax.lax.dynamic_update_slice(Qidx, idx[:, None], (0, k))
            return hatWr, Qidx
        return jax.lax.fori_loop(0, m, body, (hatWr, Qidx))

    hatWr = jnp.zeros_like(Wr)
    Qidx = jnp.zeros((rows, m), jnp.int32)
    hatWr, Qidx = backward_pass(hatWr, Qidx, refine=False)
    for _ in range(quip_tune_iters):
        hatWr, Qidx = backward_pass(hatWr, Qidx, refine=True)
    return hatWr, Qidx


def e8p_scale(W, scale_override: float = 0.9):
    """Per-tensor scale ||W||_2 / sqrt(numel) / override
    (E8PWeightQuantizer.find_params, ldlq_utils.py:427-441)."""
    Wf = jnp.asarray(W, jnp.float32)
    s = jnp.linalg.norm(Wf) / jnp.sqrt(Wf.size)
    return s / (scale_override if scale_override > 0 else _E8P_SCALE)


def ldlq_quantize(W, H, *, percdamp: float = 0.01, add_until_fail: bool = True,
                  quip_tune_iters: int = 10, scale_override: float = 0.9):
    """Full LDLQ+E8P quantization of W (rows, cols) against Hessian H.

    Returns (dequantized weights, info{scale, codes}) — the counterpart of
    LDLQ.fasterquant (ldlq_utils.py:330-367)."""
    orig_dtype = W.dtype
    rows, cols = W.shape
    assert cols % CODESZ == 0, "in_features must be a multiple of 8 for E8P"
    Wf = jnp.asarray(W, jnp.float32)
    Hf = jnp.asarray(H, jnp.float32)
    dead = jnp.diag(Hf) == 0
    Hf = Hf.at[jnp.diag_indices(cols)].set(
        jnp.where(dead, 1.0, jnp.diag(Hf)))
    Wf = jnp.where(dead[None, :], 0.0, Wf)

    scale = e8p_scale(Wf, scale_override)
    L, _ = block_ldl(Hf, CODESZ, percdamp, add_until_fail)
    gp, gpn, pam, odd = _jnp_grids()
    hatWr, codes = _ldlq_scan(Wf / scale, Hf, L, gp, gpn, pam, odd,
                              quip_tune_iters=quip_tune_iters)
    Q = (hatWr * scale).astype(orig_dtype)
    if not bool(jnp.all(jnp.isfinite(Q))):
        raise ValueError("NaN in E8P-quantized weights")
    return Q, {"scale": np.asarray(scale), "zero": np.zeros(()),
               "codes": np.asarray(codes)}


@functools.lru_cache(maxsize=1)
def _affine_int4_table() -> np.ndarray:
    """Per-code signed-int4 re-encoding of the grid: every E8P value is an
    odd multiple of 1/4 (D8 + 1/4 coset, |4v| <= 11), so v = (q + 0.5) / 2
    with q = (4v - 1) / 2 a signed int4 in [-6, 5].  Lossless."""
    q4 = np.round(e8p_grid() * 4.0).astype(np.int32)   # odd ints
    return ((q4 - 1) // 2).astype(np.int8)             # (65536, 8)


def e8p_codes_to_int4(codes) -> np.ndarray:
    """codes (rows, cols/8) int -> signed int4 q (rows, cols) such that the
    dequantized weight is exactly (q + 0.5) * (scale / 2).  This is the
    serving-side re-encoding that lets the fused planar-int4 kernel
    (kernels.matmul_w4.w4_affine_matmul) serve E8P at 4 bits/weight with
    zero decode compute (quiptools_cuda role, ldlq_utils.py:10)."""
    tab = _affine_int4_table()
    q = tab[np.asarray(codes)]                          # (rows, m, 8)
    return q.reshape(q.shape[0], -1)


def e8p_dequantize(codes, scale):
    """Grid lookup dequantization (E8PQuantizedWeights.dequantize,
    ldlq_utils.py:398-402). codes: (rows, cols/8) int32."""
    grid = jnp.asarray(e8p_grid(), jnp.float32)
    vals = grid[codes]  # (rows, m, 8)
    rows, m, _ = vals.shape
    return vals.reshape(rows, m * CODESZ) * scale
