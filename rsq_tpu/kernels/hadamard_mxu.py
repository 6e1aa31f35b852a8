"""MXU-native fast Hadamard transform.

TPU replacement for the reference's CUDA FWHT (Dao-AILab
fast-hadamard-transform, consumed via hadamard_utils.matmul_hadU_cuda
:100-110).  A radix-2 butterfly is the right shape for CUDA; on TPU the
log-depth reshape ladder fights Mosaic/XLA vector layouts, while the MXU
makes small dense +-1 matmuls nearly free.  So we use the Kronecker split

    H_n = H_A (x) H_B,   n = A * B,  B = lane-width tile (<=256, pow2)

and evaluate  y = H_A . X . H_B  with two MXU matmuls on the reshaped
(rows, A, B) view.  The transform is HBM-bandwidth-bound; the extra MXU
flops ((A+B) vs log2(n) per element) ride in the shadow of the loads.
The non-pow2 factor K ends up inside H_A automatically (get_hadK).

Exposed as `hadamard_transform` with a `fuse`-friendly jnp implementation:
under jit XLA fuses the reshape + both matmuls into one pipelined loop.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from rsq_tpu.core.hadamard import get_hadK, hadamard_matrix, is_pow2


@functools.lru_cache(maxsize=None)
def _split(n: int) -> tuple[int, int]:
    """Pick n = A * B with B a power of two <= 256 (lane-friendly) and H_A
    constructible."""
    K, _ = get_hadK(n)  # validates constructibility of the odd part
    pow2 = n // K
    B = min(pow2, 256)
    while B > 1 and not is_pow2(B):
        B //= 2
    A = n // B
    return A, B


@functools.lru_cache(maxsize=None)
def _factors_np(n: int):
    """Cache host numpy factors only — caching jnp arrays would leak tracers
    when the first call happens inside a jit/shard_map trace."""
    A, B = _split(n)
    HA = hadamard_matrix(A).astype(np.float32)
    HB = hadamard_matrix(B).astype(np.float32) if B > 1 else None
    return A, B, HA, HB


def hadamard_transform(x: jax.Array, dtype=None) -> jax.Array:
    """Orthonormal Hadamard transform over the last axis (n = K * 2^m).

    Equivalent to core.hadamard.matmul_hadU (same operator: x @ M^T/sqrt(n)),
    optimized for the MXU. HIGHEST precision keeps the +-1 contractions exact.
    """
    n = x.shape[-1]
    A, B, HA_np, HB_np = _factors_np(n)
    orig_dtype = x.dtype
    if dtype is None and orig_dtype == jnp.bfloat16:
        # bf16 fast path: H entries are +-1, so x*h products are EXACT in
        # bf16 and each einsum accumulates in f32 (per-factor results are
        # bit-identical to the f32 path; only the bf16 round-trip BETWEEN
        # the two factors differs, matching the reference's default fp16
        # online Hadamard, utils.py:103 fp32_had=False).  The MXU runs one
        # bf16 pass instead of HIGHEST-precision f32 (6 passes).
        xf = x.reshape(*x.shape[:-1], A, B)
        if HB_np is not None:
            HB = jnp.asarray(HB_np, dtype=jnp.bfloat16)
            xf = jnp.einsum("...ab,bc->...ac", xf, HB,
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
        HA = jnp.asarray(HA_np, dtype=jnp.bfloat16)
        xf = jnp.einsum("ka,...ab->...kb", HA, xf,
                        preferred_element_type=jnp.float32)
        out = xf.reshape(x.shape) / math.sqrt(n)
        return out.astype(orig_dtype)
    compute_dtype = dtype or (jnp.float32 if x.dtype != jnp.float64 else x.dtype)
    xf = x.astype(compute_dtype).reshape(*x.shape[:-1], A, B)
    hp = jax.lax.Precision.HIGHEST
    if HB_np is not None:
        HB = jnp.asarray(HB_np, dtype=compute_dtype)
        xf = jnp.einsum("...ab,bc->...ac", xf, HB, precision=hp)
    HA = jnp.asarray(HA_np, dtype=compute_dtype)
    xf = jnp.einsum("ka,...ab->...kb", HA, xf, precision=hp)
    out = xf.reshape(x.shape) / math.sqrt(n)
    return out.astype(orig_dtype)
