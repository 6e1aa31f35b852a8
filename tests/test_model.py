"""Model correctness: our functional forward vs the HuggingFace torch
implementation on a tiny random Llama/Qwen2 — the strongest available oracle
without network access."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.hf import from_hf_model
from rsq_tpu.models.policy import FP16, QuantPolicy, KVQuantConfig
from rsq_tpu.core.quant import ActQuantConfig


def _tiny_hf_llama(seed=0, num_kv=2, attention_bias=False, model="llama"):
    import torch
    torch.manual_seed(seed)
    if model == "llama":
        from transformers import LlamaConfig, LlamaForCausalLM
        cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=num_kv, max_position_embeddings=128,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
            attention_bias=attention_bias, attn_implementation="eager")
        return LlamaForCausalLM(cfg).eval()
    from transformers import Qwen2Config, Qwen2ForCausalLM
    cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=num_kv,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager")
    return Qwen2ForCausalLM(cfg).eval()


@pytest.mark.parametrize("model,num_kv,bias", [
    ("llama", 2, False),
    ("llama", 4, False),
    ("llama", 2, True),   # qwen-style qkv bias on llama arch
    ("qwen2", 2, False),  # qwen2 always has qkv bias
])
def test_forward_matches_hf(model, num_kv, bias):
    import torch
    hf = _tiny_hf_llama(num_kv=num_kv, attention_bias=bias, model=model)
    cfg, params = from_hf_model(hf)
    ids = np.random.default_rng(0).integers(0, 128, size=(2, 12))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got = np.asarray(M.forward(params, jnp.asarray(ids), cfg, FP16))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_forward_quant_policies_run_and_differ():
    cfg = ModelConfig.tiny()
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (1, 16)))
    base = M.forward(params, ids, cfg, FP16)
    pol = QuantPolicy(a=ActQuantConfig(bits=4, sym=True),
                      v=ActQuantConfig(bits=4, sym=True),
                      k=KVQuantConfig(bits=4))
    quant = M.forward(params, ids, cfg, pol)
    assert base.shape == quant.shape
    diff = float(jnp.mean(jnp.abs(base - quant)))
    assert diff > 0  # quantization must actually change the output
    # but not be garbage
    assert float(jnp.mean(jnp.abs(base))) * 10 > diff


def test_online_hadamard_is_noop_at_fp16_when_weights_rotated():
    """If down_proj weights are counter-rotated, enabling the online Hadamard
    must preserve the output (the QuaRot invariance)."""
    from rsq_tpu.core.hadamard import hadamard_matrix
    cfg = ModelConfig.tiny(num_layers=1)
    params = M.init_params(cfg, jax.random.PRNGKey(2))
    ids = jnp.asarray(np.random.default_rng(2).integers(0, cfg.vocab_size, (1, 8)))
    base = M.forward(params, ids, cfg, FP16)

    n = cfg.intermediate_size
    H = jnp.asarray(hadamard_matrix(n) / np.sqrt(n), dtype=jnp.float32)
    rotated = jax.tree_util.tree_map(lambda x: x, params)  # shallow structural copy
    lp = dict(rotated["layers"][0])
    lp["down"] = {"w": H.T @ params["layers"][0]["down"]["w"], "b": None}
    rotated["layers"][0] = lp

    pol = QuantPolicy(online_had_down=True)
    got = M.forward(rotated, ids, cfg, pol)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-3, atol=2e-4)


def test_rope_scaling_llama3_runs():
    from rsq_tpu.models.config import RopeScaling
    cfg = ModelConfig.tiny(rope_scaling=RopeScaling(
        factor=8.0, original_max_position_embeddings=64))
    params = M.init_params(cfg, jax.random.PRNGKey(3))
    ids = jnp.zeros((1, 8), jnp.int32)
    out = M.forward(params, ids, cfg, FP16)
    assert np.isfinite(np.asarray(out)).all()


def test_attention_probs_rows_sum_to_one():
    cfg = ModelConfig.tiny(num_layers=1)
    params = M.init_params(cfg, jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 10, cfg.hidden_size))
    cos, sin = M.rope_tables(cfg, jnp.arange(10))
    _, probs = M.layer_forward(params["layers"][0], x, cos, sin, cfg, FP16,
                               return_probs=True)
    sums = np.asarray(jnp.sum(probs, axis=-1))
    np.testing.assert_allclose(sums, np.ones_like(sums), rtol=1e-5)


def test_chunked_attention_matches_dense():
    rng = np.random.default_rng(20)
    b, s, h, d = 2, 300, 4, 32
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    dense = M.attention_dense(q, k, v, M.causal_mask(s))
    chunk = M.attention_chunked(q, k, v, q_chunk=64, k_chunk=96)
    np.testing.assert_allclose(np.asarray(chunk), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)


def test_attention_dispatch_long_seq():
    # above the threshold the chunked path engages and matches
    rng = np.random.default_rng(21)
    b, s, h, d = 1, 2064, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    auto = M.attention(q, k, v, None)
    dense = M.attention_dense(q, k, v, M.causal_mask(s))
    np.testing.assert_allclose(np.asarray(auto), np.asarray(dense),
                               rtol=3e-4, atol=3e-4)
