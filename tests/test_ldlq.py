"""E8P codebook + LDLQ tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.quantize import ldlq as L


def test_abs_grid_properties():
    ag = L.abs_grid()
    assert ag.shape[1] == 8
    # D8 part: half-integers, nonneg, norm^2 <= 10; norm-12 rows at the end
    assert (ag >= 0).all() or (ag[:, 7] <= 4).all()
    norms = (ag ** 2).sum(-1)
    assert norms.max() <= 12 + 1e-9
    assert (np.abs(ag * 2 - np.round(ag * 2)) < 1e-9).all()  # half-integers


def test_full_grid_is_e8p():
    g = L.e8p_grid()
    assert g.shape == (1 << 16, 8)
    # all entries are quarter-integers with |v| <= 4.25
    assert (np.abs(g * 4 - np.round(g * 4)) < 1e-9).all()
    assert np.abs(g).max() <= 4.25
    # codewords are distinct
    assert len(np.unique(g.round(4), axis=0)) == (1 << 16)


def test_codebook_decode_consistency():
    """quantize_e8p's returned code must decode (via the full grid) to the
    returned value — the pack/dequant contract of the serving path."""
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    vals, codes = L.quantize_e8p(X)
    grid = L.e8p_grid()
    decoded = grid[np.asarray(codes)]
    np.testing.assert_allclose(np.asarray(vals), decoded, atol=1e-5)


def test_quantize_e8p_is_near_nearest():
    """Fast two-coset search must match brute-force nearest codeword for
    most points (ties/boundaries allowed) and never be much worse."""
    rng = np.random.default_rng(1)
    X = rng.standard_normal((128, 8)).astype(np.float32)
    vals, _ = L.quantize_e8p(jnp.asarray(X))
    err_fast = np.linalg.norm(np.asarray(vals) - X, axis=-1)
    g = L.e8p_grid()
    d = ((X[:, None, :] - g[None, :, :]) ** 2).sum(-1)
    err_true = np.sqrt(d.min(axis=1))
    assert (err_fast <= err_true + 1e-4).mean() > 0.99
    assert np.mean(err_fast) <= np.mean(err_true) * 1.05


def test_block_ldl_reconstructs():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((32, 16)).astype(np.float32)
    H = A.T @ A + 0.5 * np.eye(16, dtype=np.float32)
    Lm, D = L.block_ldl(H, 8, percdamp=0.0, add_until_fail=False)
    Lnp = np.asarray(Lm)
    Dnp = np.asarray(D)
    Dfull = np.zeros((16, 16))
    for i in range(2):
        Dfull[i * 8:(i + 1) * 8, i * 8:(i + 1) * 8] = Dnp[i]
    np.testing.assert_allclose(Lnp @ Dfull @ Lnp.T, H, rtol=1e-3, atol=1e-3)
    # unit block diagonal
    for i in range(2):
        np.testing.assert_allclose(Lnp[i * 8:(i + 1) * 8, i * 8:(i + 1) * 8],
                                   np.eye(8), atol=1e-5)


def test_ldlq_quantize_end_to_end():
    rng = np.random.default_rng(3)
    rows, cols = 16, 32
    W = rng.standard_normal((rows, cols)).astype(np.float32) * 0.05
    A = rng.standard_normal((128, cols)).astype(np.float32)
    H = (2.0 / 128) * A.T @ A
    Q, info = L.ldlq_quantize(jnp.asarray(W), jnp.asarray(H),
                              quip_tune_iters=2)
    assert np.isfinite(np.asarray(Q)).all()
    # codes decode to the same dequantized weights
    deq = L.e8p_dequantize(jnp.asarray(info["codes"]), float(info["scale"]))
    np.testing.assert_allclose(np.asarray(Q), np.asarray(deq),
                               rtol=1e-4, atol=1e-5)
    # 2-bit quantization should still correlate strongly with W
    corr = np.corrcoef(np.asarray(Q).ravel(), W.ravel())[0, 1]
    assert corr > 0.8


def test_ldlq_beats_plain_rounding_in_hessian_metric():
    rng = np.random.default_rng(4)
    rows, cols = 8, 32
    W = rng.standard_normal((rows, cols)).astype(np.float32) * 0.05
    A = rng.standard_normal((64, cols)).astype(np.float32) @ \
        (np.eye(cols) + 0.5 * rng.standard_normal((cols, cols))).astype(np.float32)
    H = (2.0 / 64) * A.T @ A + 0.01 * np.eye(cols, dtype=np.float32)

    Q, info = L.ldlq_quantize(jnp.asarray(W), jnp.asarray(H),
                              quip_tune_iters=4)
    # naive: round each 8-block independently at the same scale
    s = float(info["scale"])
    naive = np.zeros_like(W)
    for k in range(cols // 8):
        vals, _ = L.quantize_e8p(jnp.asarray(W[:, k * 8:(k + 1) * 8] / s))
        naive[:, k * 8:(k + 1) * 8] = np.asarray(vals) * s

    def err(Q_):
        E = np.asarray(Q_, dtype=np.float64) - W
        return float(np.einsum("rc,cd,rd->", E, H.astype(np.float64), E))

    assert err(Q) <= err(naive) * 1.001
