"""Importance-weighting strategy tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import FP16
from rsq_tpu.quantize import weighting as W


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny(num_layers=1)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    L = 16
    x = jax.random.normal(jax.random.PRNGKey(1), (L, cfg.hidden_size))
    cos, sin = M.rope_tables(cfg, jnp.arange(L))
    out = M.layer_forward(params["layers"][0], x[None], cos, sin, cfg, FP16)[0]
    tf = jnp.ones((L,), jnp.int32)
    return cfg, params["layers"][0], x, out, tf


ALL_METHODS = ["attncon", "actnorm", "actdiff", "tokenfreq", "tokensim",
               "cluster", "dot"]


@pytest.mark.parametrize("method", ALL_METHODS)
def test_methods_produce_valid_weights(setup, method):
    cfg, lp, x, out, tf = setup
    wcfg = W.WeightingConfig(method=method, min_value=0.005, max_value=1.0,
                             n_clusters=4)
    w = W.compute_sample_weight(lp, x, out, tf, cfg, FP16, wcfg)
    w = np.asarray(w)
    assert w.shape == (x.shape[0],)
    assert np.isfinite(w).all()
    assert w.min() >= 0.005 - 1e-6 and w.max() <= 1.0 + 1e-6
    if method != "tokenfreq":  # uniform freqs in this fixture -> constant
        assert w.max() > w.min()  # non-degenerate


def test_attncon_matches_direct_attention(setup):
    """attncon == column sums of softmax attention probabilities, summed over
    heads — cross-check against the model's own prob-returning forward."""
    cfg, lp, x, out, tf = setup
    L = x.shape[0]
    cos, sin = M.rope_tables(cfg, jnp.arange(L))
    _, probs = M.layer_forward(lp, x[None], cos, sin, cfg, FP16,
                               return_probs=True)
    want = np.asarray(jnp.sum(probs[0], axis=(0, 1)))  # sum heads + queries

    wcfg = W.WeightingConfig(method="attncon", normalize=None)
    got = np.asarray(W.compute_sample_weight(lp, x, out, tf, cfg, FP16, wcfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_postprocess_minmax_range():
    w = jnp.asarray([1.0, 2.0, 3.0, 10.0])
    cfg = W.WeightingConfig(min_value=0.5, max_value=2.0)
    out = np.asarray(W.postprocess(w, cfg))
    assert out.min() == pytest.approx(0.5)
    assert out.max() == pytest.approx(2.0)
    assert np.all(np.diff(out) > 0)  # monotone


def test_postprocess_masking_zeroes_smallest():
    w = jnp.asarray([5.0, 1.0, 3.0, 4.0, 2.0, 6.0, 7.0, 8.0])
    cfg = W.WeightingConfig(masking=0.25, normalize=None)
    out = np.asarray(W.postprocess(w, cfg))
    assert set(np.where(out == 0)[0]) == {1, 4}
    assert (out[out != 0] == 1.0).all()


def test_postprocess_binning():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    cfg = W.WeightingConfig(num_bins=4, min_value=0.0, max_value=3.0,
                            normalize=None)
    out = np.asarray(W.postprocess(w, cfg))
    assert set(np.unique(out)) <= {0.0, 1.0, 2.0, 3.0}


def test_heuristic_patterns():
    w = np.asarray(W.heuristic_weight(8, "first_half"))
    np.testing.assert_array_equal(w, [0, 0, 0, 0, 1, 1, 1, 1])
    w = np.asarray(W.heuristic_weight(8, "0_4"))
    np.testing.assert_array_equal(w, [1, 1, 0, 0, 0, 0, 0, 0])
    w = np.asarray(W.heuristic_weight(8, "0_3_4"))
    np.testing.assert_array_equal(w, [1, 1, 0, 0, 0, 0, 1, 1])


def test_token_frequencies():
    ids = np.array([[1, 2, 2, 3], [3, 3, 1, 2]])
    tf = np.asarray(W.token_frequencies(ids))
    # freq: 1->2, 2->3, 3->3
    np.testing.assert_array_equal(tf, [[2, 3, 3, 3], [3, 3, 2, 3]])


def test_calibration_masks_shapes_and_causality():
    L, n = 12, 4
    for maker in [lambda: W.block_attn_mask(L, n),
                  lambda: W.window_attn_mask(L, n),
                  lambda: W.sink_attn_mask(L, n, 2)]:
        m = np.asarray(maker())
        assert m.shape == (L, L)
        # diagonal always allowed, strictly-future never allowed
        assert (np.diag(m) == 0).all()
        iu = np.triu_indices(L, 1)
        assert (m[iu] < -1e20).all()
    # window: exactly n allowed per full row
    m = np.asarray(W.window_attn_mask(L, n))
    assert (m[n:] == 0).sum(axis=-1).max() == n
    # shift: causality holds in ROLLED coordinates and each rolled block is
    # fully connected causally
    m = np.asarray(W.shift_attn_mask(L, n))
    idx = np.roll(np.arange(L), n // 2)
    allowed = m == 0
    assert (allowed == ((idx[:, None] // n == idx[None, :] // n)
                        & (idx[:, None] >= idx[None, :]))).all()


def test_topk_logits():
    logits = jnp.asarray(np.random.default_rng(1).standard_normal((6, 6)),
                         dtype=jnp.float32)
    out = np.asarray(W.apply_topk_to_logits(logits, 2))
    kept = (out > -1e20).sum(axis=-1)
    assert kept.max() <= 3  # top-2 plus self
    assert (np.diag(out) > -1e20).all()


def test_kmeans_converges_on_separated_clusters():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((20, 4)) * 0.1 + 10
    b = rng.standard_normal((20, 4)) * 0.1 - 10
    x = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    assign, c = W.kmeans(x, 2, iters=10)
    assign = np.asarray(assign)
    assert len(set(assign[:20])) == 1 and len(set(assign[20:])) == 1
    assert assign[0] != assign[-1]
