"""Hadamard transform library.

The reference (fake_quant/hadamard_utils.py) hardcodes thirteen non-power-of-2
Hadamard blocks K in {12,20,28,36,40,48,52,60,108,140,148,156,172} as ~4,000
lines of literals, factors n = K * 2^m (`get_hadK`, hadamard_utils.py:5-64),
and runs a torch butterfly / CUDA FWHT (`matmul_hadU`, :66-88).

Here the base matrices are *constructed* (Paley I / Paley II over GF(p^k),
plus Sylvester doubling) so no tables are shipped, and the transform is a
jittable radix-2 butterfly over the last axis that XLA maps onto the VPU; a
Pallas kernel (rsq_tpu/kernels/hadamard_pallas.py) covers the serving path.

Orders with odd part t are served by a base of order t * 2^j:
  12 (Paley I q=11),  20 (q=19),  28 (Paley II q=13),  36 (Paley II q=17),
  44 (q=43),  52 (Paley II q=25=5^2),  60 (q=59),  84 (q=83),
  108 (q=107), 140 (q=139), 148 (Paley II q=73),
  312 = 39*8 (q=311; covers the reference's K=156 sizes),
  344 = 43*8 (q=343=7^3; covers the reference's K=172 sizes, e.g. 11008).
All constructions are validated by H @ H.T == n*I (tests/test_hadamard.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hadamard_matrix", "get_hadK", "fwht", "hadU_supported", "matmul_hadU",
    "random_hadamard_matrix", "random_orthogonal_matrix", "is_pow2",
    "hadamard_transform_last",
]


def is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


# ---------------------------------------------------------------------------
# Finite-field arithmetic (small GF(p^k)) for the Paley constructions.
# ---------------------------------------------------------------------------

def _factor_prime_power(q: int) -> tuple[int, int]:
    for p in range(2, q + 1):
        if q % p == 0:
            k = 0
            m = q
            while m % p == 0:
                m //= p
                k += 1
            if m != 1:
                raise ValueError(f"{q} is not a prime power")
            return p, k
    raise ValueError(f"bad q={q}")


def _find_irreducible_poly(p: int, k: int) -> tuple[int, ...]:
    """Monic degree-k irreducible polynomial over GF(p), as coefficient tuple
    (c_0, ..., c_{k-1}) of x^k = -(c_0 + c_1 x + ... + c_{k-1} x^{k-1})."""
    # Brute force over monic polynomials; irreducible iff it has no divisor
    # of degree <= k//2.  For the tiny fields we need (p^k <= 343) trial
    # division over all monic polys of low degree is instant.
    def polys(deg):
        # all polynomials of exactly degree `deg` (monic not required)
        for coeffs in np.ndindex(*([p] * deg)):
            yield coeffs

    def polydivmod(a, b):
        # a, b lists little-endian; b monic-ized; returns remainder
        a = list(a)
        db, da = len(b) - 1, len(a) - 1
        inv_lead = pow(b[-1], p - 2, p) if b[-1] != 1 else 1
        while da >= db and any(a):
            coef = a[da] * inv_lead % p
            for i in range(db + 1):
                a[da - db + i] = (a[da - db + i] - coef * b[i]) % p
            while a and a[-1] == 0:
                a.pop()
            da = len(a) - 1
        return a

    for tail in np.ndindex(*([p] * k)):
        cand = list(tail) + [1]  # monic degree k
        if cand[0] == 0:
            continue
        reducible = False
        for d in range(1, k // 2 + 1):
            for low in polys(d):
                div = list(low) + [1]  # monic degree d
                if not polydivmod(cand, div):
                    reducible = True
                    break
            if reducible:
                break
        if not reducible:
            return tuple(cand[:k])
    raise RuntimeError(f"no irreducible poly found for GF({p}^{k})")


def _gf_elements_and_mul(q: int):
    """Return (elements, mul) for GF(q): elements as ints 0..q-1 encoding
    base-p coefficient vectors; mul(a, b) multiplies in the field."""
    p, k = _factor_prime_power(q)
    if k == 1:
        return list(range(q)), lambda a, b: (a * b) % p

    red = _find_irreducible_poly(p, k)

    def decode(a):
        out = []
        for _ in range(k):
            out.append(a % p)
            a //= p
        return out

    def encode(c):
        v = 0
        for x in reversed(c):
            v = v * p + x
        return v

    def mul(a, b):
        ca, cb = decode(a), decode(b)
        prod = [0] * (2 * k - 1)
        for i, x in enumerate(ca):
            if x:
                for j, y in enumerate(cb):
                    prod[i + j] = (prod[i + j] + x * y) % p
        # reduce modulo x^k + red
        for d in range(2 * k - 2, k - 1, -1):
            c = prod[d]
            if c:
                prod[d] = 0
                for i in range(k):
                    prod[d - k + i] = (prod[d - k + i] - c * red[i]) % p
        return encode(prod[:k])

    return list(range(q)), mul


def _quadratic_character(q: int) -> np.ndarray:
    """chi over GF(q): chi[0]=0, chi[x]=+1 if x is a nonzero square else -1."""
    elems, mul = _gf_elements_and_mul(q)
    squares = {mul(x, x) for x in elems if x != 0}
    chi = np.full(q, -1, dtype=np.int64)
    chi[0] = 0
    for s in squares:
        chi[s] = 1
    return chi


def _gf_sub_table(q: int) -> np.ndarray:
    """table[i, j] = element index of (a_i - a_j) in GF(q)."""
    p, k = _factor_prime_power(q)
    idx = np.arange(q)
    if k == 1:
        return (idx[:, None] - idx[None, :]) % p
    # vectorized per-digit subtraction in base p
    digits = []
    a = idx.copy()
    for _ in range(k):
        digits.append(a % p)
        a //= p
    digits = np.stack(digits, axis=-1)  # (q, k)
    diff = (digits[:, None, :] - digits[None, :, :]) % p
    out = np.zeros((q, q), dtype=np.int64)
    for d in range(k - 1, -1, -1):
        out = out * p + diff[..., d]
    return out


def _jacobsthal(q: int) -> np.ndarray:
    """Q[i, j] = chi(a_i - a_j)."""
    chi = _quadratic_character(q)
    return chi[_gf_sub_table(q)]


def _paley_I(q: int) -> np.ndarray:
    """Hadamard matrix of order q+1 for prime power q == 3 (mod 4)."""
    assert q % 4 == 3
    n = q + 1
    Q = _jacobsthal(q)
    S = np.zeros((n, n), dtype=np.int64)
    S[0, 1:] = 1
    S[1:, 0] = -1
    S[1:, 1:] = Q
    H = S + np.eye(n, dtype=np.int64)
    return H


def _paley_II(q: int) -> np.ndarray:
    """Hadamard matrix of order 2(q+1) for prime power q == 1 (mod 4)."""
    assert q % 4 == 1
    n = q + 1
    Q = _jacobsthal(q)
    S = np.zeros((n, n), dtype=np.int64)
    S[0, 1:] = 1
    S[1:, 0] = 1
    S[1:, 1:] = Q
    A = np.array([[1, 1], [1, -1]], dtype=np.int64)
    B = np.array([[1, -1], [-1, -1]], dtype=np.int64)
    H = np.kron(S, A) + np.kron(np.eye(n, dtype=np.int64), B)
    return H


# odd part -> (construction, parameter)
_BASE_RECIPES = {
    1: None,
    3: ("I", 11),     # H12
    5: ("I", 19),     # H20
    7: ("II", 13),    # H28
    9: ("II", 17),    # H36
    11: ("I", 43),    # H44
    13: ("II", 25),   # H52 (GF(5^2))
    15: ("I", 59),    # H60
    21: ("I", 83),    # H84
    27: ("I", 107),   # H108
    33: ("I", 131),   # H132
    35: ("I", 139),   # H140
    37: ("II", 73),   # H148
    39: ("I", 311),   # H312 = 39 * 8
    43: ("I", 343),   # H344 = 43 * 8 (GF(7^3))
}


@functools.lru_cache(maxsize=None)
def _base_matrix(odd: int) -> np.ndarray | None:
    """Smallest constructible Hadamard matrix whose order has odd part `odd`."""
    recipe = _BASE_RECIPES.get(odd)
    if recipe is None:
        if odd == 1:
            return None
        raise ValueError(f"no Hadamard construction known here for odd part {odd}")
    kind, q = recipe
    H = _paley_I(q) if kind == "I" else _paley_II(q)
    n = H.shape[0]
    assert (H @ H.T == n * np.eye(n, dtype=np.int64)).all(), f"bad Hadamard {n}"
    return H


@functools.lru_cache(maxsize=None)
def get_hadK(n: int) -> tuple[int, np.ndarray | None]:
    """Factor n = K * 2^m with an available base block of order K.

    Returns (K, hadK) where hadK is the +-1 base matrix (float32) or None when
    n is a power of two (K == 1).  Counterpart of the reference's `get_hadK`
    (hadamard_utils.py:5-64), but table-free: any n whose odd part has a known
    construction is supported.
    """
    odd = n
    while odd % 2 == 0:
        odd //= 2
    if odd == 1:
        return 1, None
    H = _base_matrix(odd)
    K = H.shape[0]
    if n % K != 0 or not is_pow2(n // K):
        raise ValueError(f"size {n} not factorable as K*2^m with K={K}")
    return K, H.astype(np.float32)


@functools.lru_cache(maxsize=None)
def hadamard_matrix(n: int, dtype=np.float64) -> np.ndarray:
    """Dense +-1 Hadamard matrix of order n (unnormalized), built as
    H_base kron H_sylvester. Matches the operator applied by matmul_hadU."""
    K, hadK = get_hadK(n)
    m = n // K
    H2 = np.array([[1.0, 1.0], [1.0, -1.0]])
    Hs = np.array([[1.0]])
    while Hs.shape[0] < m:
        Hs = np.kron(Hs, H2)
    if K == 1:
        return Hs.astype(dtype)
    return np.kron(hadK.astype(np.float64), Hs).astype(dtype)


# ---------------------------------------------------------------------------
# Fast transform (jittable)
# ---------------------------------------------------------------------------

_DENSE_HAD_CACHE: dict = {}


def dense_hadamard(n: int) -> np.ndarray:
    """The UNNORMALIZED +-1 Hadamard matrix H_n as a dense array, equal to
    H_K kron H_{2^m} for n = K * 2^m — the dense twin of matmul_hadU's
    butterfly+block transform (y = H_n @ x / sqrt(n)).  Used by Pallas
    kernels that fold the per-head transform into an MXU dot
    (kernels/kv_cache.decode_prep)."""
    hit = _DENSE_HAD_CACHE.get(n)
    if hit is not None:
        return hit
    K, hadK = get_hadK(n)
    m = n // K
    h = np.ones((1, 1), np.float32)
    while h.shape[0] < m:
        h = np.block([[h, h], [h, -h]])
    if K > 1:
        h = np.kron(np.asarray(hadK, np.float32), h)
    _DENSE_HAD_CACHE[n] = h
    return h


def fwht(x: jax.Array, axis: int = -1) -> jax.Array:
    """Unnormalized Walsh-Hadamard transform along `axis` (size = 2^m).

    Radix-2 butterfly expressed with reshapes; XLA fuses the whole ladder
    into a handful of VPU ops. Equivalent to x @ H_n (Sylvester order).
    """
    if axis != -1:
        x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    assert is_pow2(n), f"fwht needs a power-of-2 size, got {n}"
    orig_shape = x.shape
    h = 1
    while h < n:
        x = x.reshape(*orig_shape[:-1], n // (2 * h), 2, h)
        a = x[..., 0, :]
        b = x[..., 1, :]
        x = jnp.concatenate([a + b, a - b], axis=-1)
        h *= 2
    x = x.reshape(orig_shape)
    if axis != -1:
        x = jnp.moveaxis(x, -1, axis)
    return x


def matmul_hadU(x: jax.Array, dtype=None) -> jax.Array:
    """Apply the orthonormal Hadamard operator H_n/sqrt(n) along the last axis.

    n = K * 2^m: a radix-2 butterfly over the 2^m part followed by one
    (K, K) block matmul, mirroring the reference's transform semantics
    (hadamard_utils.py:66-88) with H_total = H_K kron H_{2^m}.
    """
    n = x.shape[-1]
    K, hadK = get_hadK(n)
    compute_dtype = dtype or (jnp.float32 if x.dtype != jnp.float64 else x.dtype)
    orig_dtype = x.dtype
    xf = x.astype(compute_dtype)
    if K == 1:
        out = fwht(xf)
    else:
        m = n // K
        xf = xf.reshape(*x.shape[:-1], K, m)
        xf = fwht(xf)  # butterfly within each K-block
        hk = jnp.asarray(hadK, dtype=compute_dtype)
        # mix across the K blocks: out[..., k, j] = sum_k' H[k, k'] x[..., k', j].
        # HIGHEST precision: the +-1 mixing must stay exact on the MXU.
        out = jnp.einsum("kl,...lj->...kj", hk, xf,
                         precision=jax.lax.Precision.HIGHEST,
                         ).reshape(*x.shape[:-1], n)
    return (out / math.sqrt(n)).astype(orig_dtype)


def hadamard_transform_last(x: jax.Array, block: int | None = None,
                            dtype=None) -> jax.Array:
    """Orthonormal Hadamard over the last axis, optionally in sub-blocks.

    block=None: full-width transform (= matmul_hadU).
    block=b: reshape (..., n) -> (..., n//b, b) and transform each b-chunk
    (the per-head exact Hadamard used on v_proj/o_proj).
    """
    if block is None:
        return matmul_hadU(x, dtype=dtype)
    n = x.shape[-1]
    assert n % block == 0
    xs = x.reshape(*x.shape[:-1], n // block, block)
    return matmul_hadU(xs, dtype=dtype).reshape(x.shape)


def head_mixing_hadamard(x: jax.Array, head_dim: int, dtype=None) -> jax.Array:
    """Hadamard across heads for each within-head coordinate.

    x: (..., num_heads * head_dim).  Applies H_{num_heads}/sqrt(num_heads) to
    the head index with the within-head index fixed — the reference's
    "online partial Hadamard" on o_proj inputs (quant_utils.py:296-311).
    """
    n = x.shape[-1]
    heads = n // head_dim
    xs = x.reshape(*x.shape[:-1], heads, head_dim)
    xs = jnp.swapaxes(xs, -1, -2)  # (..., head_dim, heads)
    xs = matmul_hadU(xs, dtype=dtype)
    xs = jnp.swapaxes(xs, -1, -2)
    return xs.reshape(x.shape)


def fwht_np(x: np.ndarray) -> np.ndarray:
    """Unnormalized WHT over the last axis, numpy (host-side f64 path)."""
    n = x.shape[-1]
    assert is_pow2(n)
    orig_shape = x.shape
    h = 1
    while h < n:
        x = x.reshape(*orig_shape[:-1], n // (2 * h), 2, h)
        a = x[..., 0, :]
        b = x[..., 1, :]
        x = np.concatenate([a + b, a - b], axis=-1)
        h *= 2
    return x.reshape(orig_shape)


def hadU_supported(n: int) -> bool:
    """Whether a fast Hadamard exists for dimension n (some real model dims
    do not: falcon-7b's 4544/18176 have odd part 71, for which no Hadamard
    matrix exists — H_n requires n in {1, 2} or n % 4 == 0)."""
    try:
        get_hadK(n)
        return True
    except Exception:
        return False


def matmul_hadU_np(x: np.ndarray) -> np.ndarray:
    """Host (numpy, f64-capable) version of matmul_hadU: x @ M^T / sqrt(n).

    Used for weight-side exact-Hadamard folding during rotation, where the
    reference also works in high precision on the host
    (rotation_utils.py:122-190, hadamard_utils.py:116-171)."""
    n = x.shape[-1]
    K, hadK = get_hadK(n)
    if K == 1:
        out = fwht_np(x)
    else:
        m = n // K
        xs = fwht_np(x.reshape(*x.shape[:-1], K, m))
        out = np.einsum("kl,...lj->...kj", hadK.astype(x.dtype), xs)
        out = out.reshape(*x.shape[:-1], n)
    return out / math.sqrt(n)


# ---------------------------------------------------------------------------
# Random orthogonal generators (host-side, float64 — TPUs lack native f64, so
# rotation matrices are produced on CPU exactly as the reference does on host;
# see SURVEY.md §7.3 item 4).
# ---------------------------------------------------------------------------

def random_hadamard_matrix(n: int, seed: int = 0) -> np.ndarray:
    """Randomized orthonormal Hadamard: H_n diag(+-1) / sqrt(n), float64.

    Same family as the reference's `random_hadamard_matrix`
    (hadamard_utils.py:93-98): a sign-randomized, normalized Hadamard.
    """
    rng = np.random.default_rng(seed)
    signs = rng.integers(0, 2, size=n).astype(np.float64) * 2 - 1
    H = hadamard_matrix(n, dtype=np.float64)
    return (H * signs[None, :]) / math.sqrt(n)


def random_orthogonal_matrix(n: int, seed: int = 0) -> np.ndarray:
    """QR-based random orthogonal matrix, float64, sign-fixed so the
    distribution is Haar (rotation_utils.py:93-110)."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    q, r = np.linalg.qr(A)
    q *= np.sign(np.diag(r))[None, :]
    return q


def get_orthogonal_matrix(n: int, mode: str = "hadamard", seed: int = 0) -> np.ndarray:
    if mode == "hadamard":
        return random_hadamard_matrix(n, seed)
    if mode == "random":
        return random_orthogonal_matrix(n, seed)
    raise ValueError(f"unknown rotation mode {mode!r}")
