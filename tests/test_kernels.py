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
