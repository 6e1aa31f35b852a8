"""OPT family: HF golden parity, rotation invariance, pipeline end-to-end.

The reference supports OPT as its debug family (fake_quant/utils.py:279-280,
model_utils.py:8-31); parity here is against transformers' own torch OPT.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsq_tpu.models import family, opt as O
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import FP16, QuantPolicy
from rsq_tpu.quantize import rotation


@pytest.fixture(scope="module")
def hf_opt():
    import torch
    from transformers import OPTConfig, OPTForCausalLM
    torch.manual_seed(0)
    hf_cfg = OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=32)
    model = OPTForCausalLM(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def tiny_opt():
    cfg = ModelConfig.tiny_opt()
    params = O.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    return cfg, params


def test_opt_forward_matches_hf(hf_opt):
    import torch
    from rsq_tpu.models.hf import from_hf_model
    cfg, params = from_hf_model(hf_opt)
    assert cfg.family == "opt"
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 17))
    with torch.no_grad():
        want = hf_opt(torch.tensor(ids)).logits.numpy()
    got = np.asarray(O.forward(params, jnp.asarray(ids), cfg, FP16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_opt_fuse_norms_invariance(tiny_opt):
    cfg, params = tiny_opt
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 12)))
    base = np.asarray(O.forward(params, ids, cfg, FP16))
    fused = rotation.fuse_norms(params, cfg)
    pol = QuantPolicy(norms_fused=True)
    got = np.asarray(O.forward(fused, ids, cfg, pol))
    np.testing.assert_allclose(got, base, rtol=1e-4, atol=1e-4)


def test_opt_rotation_invariance(tiny_opt):
    cfg, params = tiny_opt
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (2, 12)))
    base = np.asarray(O.forward(params, ids, cfg, FP16))
    rotated, Q = rotation.rotate_model(params, cfg, mode="hadamard", seed=0)
    pol = QuantPolicy(norms_fused=True, online_had_down=True,
                      online_had_o=True, fp32_had=True)
    got = np.asarray(O.forward(rotated, ids, cfg, pol))
    np.testing.assert_allclose(got, base, rtol=2e-3, atol=2e-3)


def test_opt_quantize_pipeline_and_checkpoint(tmp_path, tiny_opt):
    from rsq_tpu.core.quant import WeightQuantConfig
    from rsq_tpu.eval.ppl import ppl_fullmodel
    from rsq_tpu.quantize import data as D
    from rsq_tpu.quantize.checkpoint import load_quantized, save_quantized
    from rsq_tpu.quantize.pipeline import RSQConfig, quantize_model

    cfg, params = tiny_opt
    calib = D.get_loaders("synthetic", nsamples=4, seqlen=24,
                          vocab_size=cfg.vocab_size)
    rsq = RSQConfig(w=WeightQuantConfig(bits=4), rotate=True, nsamples=4)
    qparams, quantizers = quantize_model(params, cfg, rsq, calib)
    assert "layers.0.fc2" in quantizers  # OPT group names

    stream = D.get_loaders("synthetic", eval_mode=True,
                           vocab_size=cfg.vocab_size)[:4096]
    pol = QuantPolicy(norms_fused=True, online_had_down=True,
                      online_had_o=True)
    ppl_q = ppl_fullmodel(qparams, cfg, pol, stream, val_seqlen=24, bsz=4)
    assert np.isfinite(ppl_q)
    # 4-bit GPTQ on a tiny model should stay within 2x of fp16 PPL
    ppl_fp = ppl_fullmodel(params, cfg, FP16, stream, val_seqlen=24, bsz=4)
    assert ppl_q < ppl_fp * 2.0

    save_quantized(str(tmp_path / "ck"), qparams, quantizers, cfg,
                   meta={"rotate": True})
    p2, q2, cfg2, _ = load_quantized(str(tmp_path / "ck"))
    assert cfg2.family == "opt"
    got = np.asarray(family.forward(p2, jnp.asarray(calib[:1]), cfg2, pol))
    want = np.asarray(family.forward(qparams, jnp.asarray(calib[:1]), cfg, pol))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_opt_weighting_attncon(tiny_opt):
    from rsq_tpu.quantize.weighting import (
        WeightingConfig, compute_sample_weight)
    cfg, params = tiny_opt
    L = 16
    x = jax.random.normal(jax.random.PRNGKey(3), (L, cfg.hidden_size))
    out = jax.random.normal(jax.random.PRNGKey(4), (L, cfg.hidden_size))
    tf = jnp.ones((L,))
    w = np.asarray(compute_sample_weight(
        params["layers"][0], x, out, tf, cfg, FP16,
        WeightingConfig(method="attncon", min_value=0.005, max_value=1.0)))
    assert w.shape == (L,)
    assert (w >= 0.005 - 1e-6).all() and (w <= 1.0 + 1e-6).all()
