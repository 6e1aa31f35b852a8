"""Rotation invariance: the whole point of QuaRot is that fusion + rotation
+ online transforms leave the FP model function unchanged. We verify logits
equality against the unrotated model — a stronger check than the reference
ever runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import FP16, QuantPolicy
from rsq_tpu.quantize import rotation as R


def _setup(num_heads=4, num_kv=2, hidden=64, inter=112, seed=0):
    cfg = ModelConfig.tiny(hidden_size=hidden, intermediate_size=inter,
                           num_attention_heads=num_heads,
                           num_key_value_heads=num_kv, num_layers=2)
    params = M.init_params(cfg, jax.random.PRNGKey(seed), dtype=jnp.float32)
    # give norms non-trivial weights so fusion is actually exercised
    key = jax.random.PRNGKey(seed + 1)
    for i, lp in enumerate(params["layers"]):
        k1, k2, key = jax.random.split(key, 3)
        lp["input_norm"] = 1.0 + 0.1 * jax.random.normal(k1, (hidden,))
        lp["post_norm"] = 1.0 + 0.1 * jax.random.normal(k2, (hidden,))
    params["final_norm"] = 1.0 + 0.1 * jax.random.normal(key, (hidden,))
    ids = jnp.asarray(np.random.default_rng(9).integers(0, cfg.vocab_size, (2, 10)))
    return cfg, params, ids


def test_fuse_norms_preserves_logits_up_to_embedding_centering():
    cfg, params, ids = _setup()
    # mean-centering embeddings changes the function in general; neutralize by
    # pre-centering so fusion must be exactly function-preserving.
    E = params["embed"]
    params["embed"] = E - jnp.mean(E, axis=-1, keepdims=True)
    base = M.forward(params, ids, cfg, FP16)
    fused = R.fuse_norms(params, cfg)
    assert fused["layers"][0]["input_norm"] is None
    got = M.forward(fused, ids, cfg, FP16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["hadamard", "random"])
@pytest.mark.parametrize("heads,hidden,inter", [
    (4, 64, 112),    # non-pow2 intermediate (K=28 path)
    (4, 64, 128),    # pow2 everything
])
def test_rotation_invariance_full(mode, heads, hidden, inter):
    """fused+rotated params with online Hadamards on == original logits."""
    cfg, params, ids = _setup(num_heads=heads, hidden=hidden, inter=inter)
    E = params["embed"]
    params["embed"] = E - jnp.mean(E, axis=-1, keepdims=True)
    base = M.forward(params, ids, cfg, FP16)

    rotated, Q = R.rotate_model(params, cfg, mode=mode, seed=3)
    np.testing.assert_allclose(Q @ Q.T, np.eye(hidden), atol=1e-10)

    policy = QuantPolicy(online_had_down=True, online_had_o=True,
                         fp32_had=True, norms_fused=True)
    got = M.forward(rotated, ids, cfg, policy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=5e-3, atol=5e-4)


def test_rotation_kills_activation_outliers():
    """The functional purpose of the rotation: post-rotation activations are
    less heavy-tailed (lower kurtosis / max-to-rms ratio) at the inputs of
    the quantized linears."""
    cfg, params, ids = _setup(seed=4)
    # inject an outlier channel in the embeddings
    params["embed"] = params["embed"].at[:, 7].mul(30.0)
    E = params["embed"]
    params["embed"] = E - jnp.mean(E, axis=-1, keepdims=True)

    x = M.embed(params, ids)
    ratio_before = float(jnp.max(jnp.abs(x)) / jnp.sqrt(jnp.mean(x * x)))

    rotated, Q = R.rotate_model(params, cfg, mode="hadamard", seed=5)
    xr = M.embed(rotated, ids)
    ratio_after = float(jnp.max(jnp.abs(xr)) / jnp.sqrt(jnp.mean(xr * xr)))
    assert ratio_after < ratio_before * 0.5


def test_post_rotate_after_load_matches_fresh_rotation():
    """Saving after `rotate` minus exact-Hadamards then re-applying them must
    equal the fresh rotation — validates the checkpoint reload contract."""
    cfg, params, ids = _setup(seed=6)
    fused = R.fuse_norms(params, cfg)
    Q = R.get_orthogonal_matrix(cfg.hidden_size, "hadamard", seed=7)

    full = R.rotate(fused, cfg, Q)

    # simulate the saved checkpoint: only the global-Q part baked in
    partial = R._copy_layers(fused)
    partial["embed"] = R._like(R._np64(fused["embed"]) @ Q, fused["embed"])
    partial["lm_head"] = R._like(Q.T @ R._np64(fused["lm_head"]), fused["lm_head"])
    for lp in partial["layers"]:
        for name in ("q", "k", "v", "up", "gate"):
            R._rot_in(lp[name], Q)
        R._rot_out(lp["o"], Q)
        R._rot_out(lp["down"], Q)

    reloaded = R.post_rotate_after_load(partial, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(full),
                    jax.tree_util.tree_leaves(reloaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
