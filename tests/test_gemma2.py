"""Gemma-2 family: HF golden parity, no-rotation contract, pipeline e2e.

The reference supports gemma-2-9b/27b-it (fake_quant/utils.py:22-23) for
GPTQ/RTN WITHOUT rotation (fuse_layer_norms raises for Gemma,
rotation_utils.py:61-68); parity here is against transformers' own torch
Gemma2 with eager attention (softcapping path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsq_tpu.models import family, gemma2 as G
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import FP16, QuantPolicy
from rsq_tpu.quantize import rotation


@pytest.fixture(scope="module")
def hf_gemma2():
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM
    torch.manual_seed(0)
    hf_cfg = Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, query_pre_attn_scalar=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        sliding_window=8, attn_implementation="eager")
    model = Gemma2ForCausalLM(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def tiny_gemma2():
    cfg = ModelConfig.tiny_gemma2()
    params = G.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    return cfg, params


def test_gemma2_forward_matches_hf(hf_gemma2):
    import torch
    from rsq_tpu.models.hf import from_hf_model
    cfg, params = from_hf_model(hf_gemma2)
    assert cfg.family == "gemma2"
    assert cfg.sliding_window == 8 and cfg.attn_logit_softcap == 50.0
    rng = np.random.default_rng(0)
    # seqlen 17 > window 8: layer 0 (sliding) masks differently from layer 1
    ids = rng.integers(0, 128, size=(2, 17))
    with torch.no_grad():
        want = hf_gemma2(torch.tensor(ids)).logits.numpy()
    got = np.asarray(G.forward(params, jnp.asarray(ids), cfg, FP16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gemma2_rotation_rejected(tiny_gemma2):
    cfg, params = tiny_gemma2
    with pytest.raises(NotImplementedError):
        rotation.rotate_model(params, cfg)


def test_gemma2_sliding_window_matters(tiny_gemma2):
    """Even layers must apply the window: widening it changes logits."""
    import dataclasses
    cfg, params = tiny_gemma2
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (1, 24)))
    base = np.asarray(G.forward(params, ids, cfg, FP16))
    wide = dataclasses.replace(cfg, sliding_window=1024)
    other = np.asarray(G.forward(params, ids, wide, FP16))
    assert not np.allclose(base, other, atol=1e-4)


def test_gemma2_chunked_attention_matches_dense(tiny_gemma2):
    cfg, params = tiny_gemma2
    rng = np.random.default_rng(2)
    b, s, h, d = 1, 40, 4, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    for layer in (0, 1):  # windowed and global
        dense = G.attention(q, k, v, cfg, layer, mask=None)
        chunked = G.attention_chunked(q, k, v, cfg, layer,
                                      q_chunk=16, k_chunk=16)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                                   rtol=2e-5, atol=2e-5)


def test_gemma2_quantize_pipeline_and_checkpoint(tmp_path, tiny_gemma2):
    from rsq_tpu.core.quant import WeightQuantConfig
    from rsq_tpu.eval.ppl import ppl_fullmodel, ppl_streamed
    from rsq_tpu.quantize import data as D
    from rsq_tpu.quantize.checkpoint import load_quantized, save_quantized
    from rsq_tpu.quantize.pipeline import RSQConfig, quantize_model

    cfg, params = tiny_gemma2
    calib = D.get_loaders("synthetic", nsamples=4, seqlen=24,
                          vocab_size=cfg.vocab_size)
    rsq = RSQConfig(w=WeightQuantConfig(bits=4), rotate=False, nsamples=4)
    qparams, quantizers = quantize_model(params, cfg, rsq, calib)
    assert "layers.0.down" in quantizers

    stream = D.get_loaders("synthetic", eval_mode=True,
                           vocab_size=cfg.vocab_size)[:4096]
    ppl_q = ppl_fullmodel(qparams, cfg, FP16, stream, val_seqlen=24, bsz=4)
    assert np.isfinite(ppl_q)
    ppl_fp = ppl_fullmodel(params, cfg, FP16, stream, val_seqlen=24, bsz=4)
    assert ppl_q < ppl_fp * 2.0
    # streamed evaluator agrees with the full-model one
    ppl_s = ppl_streamed(qparams, cfg, FP16, stream, val_seqlen=24, bsz=4)
    np.testing.assert_allclose(ppl_s, ppl_q, rtol=1e-3)

    save_quantized(str(tmp_path / "ck"), qparams, quantizers, cfg,
                   meta={"rotate": False})
    p2, q2, cfg2, _ = load_quantized(str(tmp_path / "ck"))
    assert cfg2.family == "gemma2"
    assert cfg2.attn_logit_softcap == cfg.attn_logit_softcap
    got = np.asarray(family.forward(p2, jnp.asarray(calib[:1]), cfg2, FP16))
    want = np.asarray(family.forward(qparams, jnp.asarray(calib[:1]), cfg,
                                     FP16))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gemma2_weighting_attncon(tiny_gemma2):
    from rsq_tpu.quantize.weighting import (
        WeightingConfig, compute_sample_weight)
    cfg, params = tiny_gemma2
    L = 16
    x = jax.random.normal(jax.random.PRNGKey(3), (L, cfg.hidden_size))
    out = jax.random.normal(jax.random.PRNGKey(4), (L, cfg.hidden_size))
    tf = jnp.ones((L,))
    for layer in (0, 1):
        w = np.asarray(compute_sample_weight(
            params["layers"][layer], x, out, tf, cfg, FP16,
            WeightingConfig(method="attncon", min_value=0.005, max_value=1.0),
            layer=layer))
        assert w.shape == (L,)
        assert (w >= 0.005 - 1e-6).all() and (w <= 1.0 + 1e-6).all()
