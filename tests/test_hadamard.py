"""Hadamard library tests: orthogonality of every constructed block
(H H^T = n I, the reference enforces this only implicitly), transform vs
dense-matrix oracle, and the head-mixing variant."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.core import hadamard as H

# Orders exercised by real models (reference get_hadK comments,
# hadamard_utils.py:5-58) mapped onto our constructible bases.
BASE_ORDERS = [12, 20, 28, 36, 44, 52, 60, 84, 108, 132, 140, 148, 312, 344]


@pytest.mark.parametrize("odd,order", [
    (3, 12), (5, 20), (7, 28), (9, 36), (11, 44), (13, 52), (15, 60),
    (21, 84), (27, 108), (33, 132), (35, 140), (37, 148), (39, 312), (43, 344),
])
def test_base_blocks_are_hadamard(odd, order):
    M = H._base_matrix(odd)
    assert M.shape == (order, order)
    assert set(np.unique(M)) <= {-1, 1}
    np.testing.assert_array_equal(M @ M.T, order * np.eye(order, dtype=np.int64))


@pytest.mark.parametrize("n", [1, 2, 8, 128, 256, 12, 24, 96, 624, 688])
def test_dense_hadamard_orthogonal(n):
    M = H.hadamard_matrix(n)
    np.testing.assert_allclose(M @ M.T, n * np.eye(n), atol=1e-8)


@pytest.mark.parametrize("n", [3584, 11008, 14336, 19968])
def test_large_transform_is_isometry(n):
    # Dense n^3 orthogonality checks are too slow at model sizes; verify the
    # operator is an isometry on random vectors instead (||Hx|| == ||x|| and
    # <Hx, Hy> == <x, y>).
    rng = np.random.default_rng(n)
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    y = H.matmul_hadU(x)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-4)
    dot_x = float(np.dot(np.asarray(x)[0], np.asarray(x)[1]))
    dot_y = float(np.dot(np.asarray(y)[0], np.asarray(y)[1]))
    assert abs(dot_x - dot_y) < 1e-1 * max(1.0, abs(dot_x))


@pytest.mark.parametrize("n", [64, 128, 96, 56, 112])
def test_matmul_hadU_matches_dense(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, n)).astype(np.float32)
    got = np.asarray(H.matmul_hadU(jnp.asarray(x)))
    want = x @ H.hadamard_matrix(n).T / math.sqrt(n)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_matmul_hadU_is_orthonormal():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 112)).astype(np.float32))
    y = H.matmul_hadU(x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)
    # involution up to transpose: applying H then H^T recovers x. For
    # symmetric pow2 blocks H itself is an involution.
    x2 = jnp.asarray(rng.standard_normal((3, 128)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(H.matmul_hadU(H.matmul_hadU(x2))),
                               np.asarray(x2), rtol=1e-4, atol=1e-5)


def test_fwht_matches_matrix():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    got = np.asarray(H.fwht(jnp.asarray(x)))
    want = x @ H.hadamard_matrix(64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_blockwise_transform():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 7, 8 * 16)).astype(np.float32)
    got = np.asarray(H.hadamard_transform_last(jnp.asarray(x), block=16))
    want = x.reshape(2, 7, 8, 16) @ H.hadamard_matrix(16).T / math.sqrt(16)
    np.testing.assert_allclose(got, want.reshape(x.shape), rtol=1e-4, atol=1e-4)


def test_head_mixing_hadamard():
    heads, dim = 8, 16
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, heads * dim)).astype(np.float32)
    got = np.asarray(H.head_mixing_hadamard(jnp.asarray(x), head_dim=dim))
    xr = x.reshape(3, heads, dim)
    want = np.einsum("hk,bkd->bhd", H.hadamard_matrix(heads) / math.sqrt(heads), xr)
    np.testing.assert_allclose(got, want.reshape(x.shape), rtol=1e-4, atol=1e-4)


def test_head_and_block_compose_to_full():
    # (H_heads (x) I_dim) @ (I_heads (x) H_dim) == H_{heads*dim} for pow2 sizes
    heads, dim = 4, 8
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, heads * dim)).astype(np.float32))
    via_parts = H.head_mixing_hadamard(
        H.hadamard_transform_last(x, block=dim), head_dim=dim)
    full = H.matmul_hadU(x)
    np.testing.assert_allclose(np.asarray(via_parts), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_random_hadamard_orthogonal():
    Qm = H.random_hadamard_matrix(256, seed=7)
    np.testing.assert_allclose(Qm @ Qm.T, np.eye(256), atol=1e-10)


def test_random_orthogonal_orthogonal():
    Qm = H.random_orthogonal_matrix(64, seed=7)
    np.testing.assert_allclose(Qm @ Qm.T, np.eye(64), atol=1e-10)


def test_get_hadK_llama_sizes():
    # llama-3-8b: hidden 4096 (pow2), intermediate 14336 = 28 * 512
    assert H.get_hadK(4096) == (1, None)
    K, M = H.get_hadK(14336)
    assert K == 28 and M.shape == (28, 28)
    # llama-2-7b up-proj 11008 -> odd part 43 -> base 344
    K, M = H.get_hadK(11008)
    assert K == 344
    # llama-1-30b 3x hidden 19968 -> odd part 39 -> base 312
    K, M = H.get_hadK(19968)
    assert K == 312
