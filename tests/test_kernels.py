"""Pallas kernel equivalence tests (interpret mode on CPU; the bench runs
them compiled on the real chip). Oracle pattern per SURVEY.md §4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.core.hadamard import matmul_hadU
from rsq_tpu.kernels import matmul_w4 as MW
from rsq_tpu.kernels.hadamard_mxu import hadamard_transform


def _mk_weights(K, N, seed=0):
    rng = np.random.default_rng(seed)
    wq = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    scale = (rng.uniform(0.5, 2.0, size=(N,)) / 7).astype(np.float32)
    return jnp.asarray(wq), jnp.asarray(scale)


def test_planar_pack_roundtrip():
    wq, _ = _mk_weights(16, 32)
    packed = MW.pack_w4_planar(wq)
    assert packed.shape == (16, 16)
    np.testing.assert_array_equal(np.asarray(MW.unpack_w4_planar(packed)),
                                  np.asarray(wq))


@pytest.mark.parametrize("M,K,N", [(16, 64, 64), (8, 128, 256), (33, 96, 64),
                                   (1, 64, 128)])
def test_w4_matmul_matches_oracle(M, K, N):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    wq, scale = _mk_weights(K, N)
    packed = MW.pack_w4_planar(wq)
    got = MW.w4_matmul(x, packed, scale, block_m=16, block_n=32, block_k=32,
                       interpret=True)
    want = MW.w4_matmul_reference(x, packed, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_w4_matmul_bit_exact_integer_path():
    """bf16 MXU emulation of int4 GEMM must be exactly integral."""
    rng = np.random.default_rng(2)
    K, N = 256, 64
    wq, _ = _mk_weights(K, N, seed=3)
    scale = jnp.ones((N,), jnp.float32)
    xq = jnp.asarray(rng.integers(-8, 8, size=(16, K)).astype(np.float32))
    got = MW.w4_matmul(xq, MW.pack_w4_planar(wq), scale, block_m=16,
                       block_n=32, block_k=64, interpret=True)
    want = np.asarray(xq, dtype=np.int64) @ np.asarray(wq, dtype=np.int64)
    np.testing.assert_array_equal(np.asarray(got).astype(np.int64), want)


@pytest.mark.parametrize("M,K,N", [(16, 64, 64), (5, 96, 128)])
def test_w4a4_matmul_matches_oracle(M, K, N):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    wq, scale = _mk_weights(K, N, seed=5)
    packed = MW.pack_w4_planar(wq)
    got = MW.w4a4_matmul(x, packed, scale, block_m=16, block_n=32,
                         block_k=32, interpret=True)
    want = MW.w4a4_matmul_reference(x, packed, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_w4a4_clip_ratio():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    wq, scale = _mk_weights(64, 64, seed=7)
    packed = MW.pack_w4_planar(wq)
    got = MW.w4a4_matmul(x, packed, scale, clip_ratio=0.9, block_m=8,
                         block_n=32, block_k=32, interpret=True)
    want = MW.w4a4_matmul_reference(x, packed, scale, clip_ratio=0.9)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(8, 128), (4, 3, 64), (16, 112),
                                   (2, 14336 // 16), (3, 14336)])
def test_mxu_hadamard_matches_jnp(shape):
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = hadamard_transform(x)
    want = matmul_hadU(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Affine W4 (E8P serving) kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("M,K,N", [(8, 64, 64), (4, 128, 256), (17, 96, 64)])
def test_w4_affine_matmul_matches_oracle(M, K, N):
    rng = np.random.default_rng(11)
    wq = jnp.asarray(rng.integers(-6, 6, size=(K, N)).astype(np.int8))
    packed = MW.pack_w4_planar(wq)
    scale = jnp.float32(0.037)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    y = MW.w4_affine_matmul(x, packed, scale)
    want = MW.w4_affine_matmul_reference(x, packed, scale)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_e8p_affine_reencode_bit_identical():
    """The int4 re-encoding must imply EXACTLY the e8p_dequantize weights:
    (q + 0.5) * (scale/2) == grid[codes] * scale bitwise in f32."""
    from rsq_tpu.quantize.ldlq import (e8p_codes_to_int4, e8p_dequantize,
                                       e8p_grid)
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 1 << 16, size=(32, 8)).astype(np.int32)
    scale = np.float32(0.731)
    q = e8p_codes_to_int4(codes)                      # (32, 64)
    assert q.min() >= -8 and q.max() <= 7
    implied = (q.astype(np.float32) + np.float32(0.5)) * (scale *
                                                          np.float32(0.5))
    want = np.asarray(e8p_dequantize(jnp.asarray(codes), scale))
    np.testing.assert_array_equal(implied, want)


# ---------------------------------------------------------------------------
# Stacked (scalar-prefetch) copy-free kernels — round-3 additions
# ---------------------------------------------------------------------------

def test_w4_matmul_paired_stacked_matches_per_layer():
    rng = np.random.default_rng(21)
    L, M, K, N = 3, 8, 128, 256
    wq = rng.integers(-8, 8, size=(L, K, N)).astype(np.int8)
    packed = jnp.stack([MW.pack_w4_planar(jnp.asarray(wq[i]))
                        for i in range(L)])
    scale = jnp.asarray(rng.uniform(0.01, 0.1, (L, N)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    for i in range(L):
        y3 = MW.w4_matmul_paired_stacked(x, packed,
                                         MW.pair_scales(scale[i]), i)
        y = MW.unpair_outputs(y3)
        want = MW.w4_matmul_reference(x, packed[i], scale[i])
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


def test_w4_affine_matmul_stacked_matches_per_layer():
    rng = np.random.default_rng(22)
    L, M, K, N = 3, 4, 64, 128
    wq = rng.integers(-8, 8, size=(L, K, N)).astype(np.int8)
    packed = jnp.stack([MW.pack_w4_planar(jnp.asarray(wq[i]))
                        for i in range(L)])
    sh = jnp.asarray(rng.uniform(0.01, 0.1, (L,)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    for i in range(L):
        y = MW.w4_affine_matmul_stacked(x, packed, sh, i)
        want = MW.w4_affine_matmul_reference(x, packed[i], sh[i])
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


def test_decode_hint_selects_same_math():
    """decode=True/False must change tiles only, never results."""
    rng = np.random.default_rng(23)
    M, K, N = 8, 128, 256
    wq = jnp.asarray(rng.integers(-8, 8, size=(K, N)).astype(np.int8))
    packed = MW.pack_w4_planar(wq)
    scale = jnp.asarray(rng.uniform(0.01, 0.1, (N,)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    y_d = MW.w4_matmul(x, packed, scale, decode=True)
    y_p = MW.w4_matmul(x, packed, scale, decode=False)
    np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_p),
                               rtol=2e-2, atol=2e-2)


def test_w16_matmul_stacked_matches_dense():
    rng = np.random.default_rng(23)
    L, M, K, N = 3, 8, 128, 256
    w = jnp.asarray(rng.standard_normal((L, K, N)) * 0.1, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.bfloat16)
    for i in range(L):
        y = MW.w16_matmul_stacked(x, w, i)
        want = x @ w[i]
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_w8_matmul_matches_reference():
    from rsq_tpu.kernels.matmul_w4 import (w8_matmul, w8_matmul_reference,
                                           w8_quantize)
    rng = np.random.default_rng(21)
    K, N, M = 256, 512, 8
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.05)
    w8, scale = w8_quantize(w)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    got = w8_matmul(x, w8, scale)
    want = w8_matmul_reference(x, w8, scale)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    # quantization error of the head itself is small
    dq = np.asarray(w8, np.float32) * np.asarray(scale)[None, :]
    rel = np.abs(dq - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01
