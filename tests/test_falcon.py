"""Falcon family: HF golden parity, rotation invariance, pipeline e2e.

The reference registers Falcon in its model registry
(fake_quant/model_utils.py:18-19, :40) and quantizer targeting
(quant_utils.py:469); parity here is against transformers' own torch
Falcon — both the falcon-7b topology (MQA, shared parallel LayerNorm) and
the 40B "new decoder architecture" (GQA, ln_attn/ln_mlp).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsq_tpu.models import falcon as F, family
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import FP16, QuantPolicy
from rsq_tpu.quantize import rotation


@pytest.fixture(scope="module")
def hf_falcon():
    import torch
    from transformers import FalconConfig, FalconForCausalLM
    torch.manual_seed(0)
    hf_cfg = FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False)
    return FalconForCausalLM(hf_cfg).eval()


@pytest.fixture(scope="module")
def hf_falcon_new_arch():
    import torch
    from transformers import FalconConfig, FalconForCausalLM
    torch.manual_seed(1)
    hf_cfg = FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2, multi_query=False,
        parallel_attn=True, new_decoder_architecture=True, bias=False,
        alibi=False)
    return FalconForCausalLM(hf_cfg).eval()


@pytest.fixture(scope="module")
def tiny_falcon():
    cfg = ModelConfig.tiny_falcon()
    params = F.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    return cfg, params


def test_falcon_forward_matches_hf(hf_falcon):
    import torch
    from rsq_tpu.models.hf import from_hf_model
    cfg, params = from_hf_model(hf_falcon)
    assert cfg.family == "falcon"
    assert cfg.num_key_value_heads == 1 and not cfg.falcon_two_norms
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 17))
    with torch.no_grad():
        want = hf_falcon(torch.tensor(ids)).logits.numpy()
    got = np.asarray(F.forward(params, jnp.asarray(ids), cfg, FP16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_falcon_new_arch_matches_hf(hf_falcon_new_arch):
    import torch
    from rsq_tpu.models.hf import from_hf_model
    cfg, params = from_hf_model(hf_falcon_new_arch)
    assert cfg.num_key_value_heads == 2 and cfg.falcon_two_norms
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, size=(2, 13))
    with torch.no_grad():
        want = hf_falcon_new_arch(torch.tensor(ids)).logits.numpy()
    got = np.asarray(F.forward(params, jnp.asarray(ids), cfg, FP16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_falcon_fuse_norms_invariance(tiny_falcon):
    cfg, params = tiny_falcon
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 12)))
    base = np.asarray(F.forward(params, ids, cfg, FP16))
    fused = rotation.fuse_norms(params, cfg)
    got = np.asarray(F.forward(fused, ids, cfg,
                               QuantPolicy(norms_fused=True)))
    np.testing.assert_allclose(got, base, rtol=1e-4, atol=1e-4)


def test_falcon_two_norm_fuse_invariance():
    cfg = ModelConfig.tiny_falcon(num_key_value_heads=2,
                                  falcon_two_norms=True)
    params = F.init_params(cfg, jax.random.PRNGKey(5), scale=0.05)
    assert params["layers"][0]["post_norm"] is not None
    ids = jnp.asarray(np.random.default_rng(6).integers(0, 256, (2, 10)))
    base = np.asarray(F.forward(params, ids, cfg, FP16))
    fused = rotation.fuse_norms(params, cfg)
    got = np.asarray(F.forward(fused, ids, cfg,
                               QuantPolicy(norms_fused=True)))
    np.testing.assert_allclose(got, base, rtol=1e-4, atol=1e-4)


def test_falcon_rotation_invariance(tiny_falcon):
    cfg, params = tiny_falcon
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (2, 12)))
    base = np.asarray(F.forward(params, ids, cfg, FP16))
    rotated, Q = rotation.rotate_model(params, cfg, mode="hadamard", seed=0)
    # no online_had_o: Falcon's v/o Hadamard pair is baked fully offline
    pol = QuantPolicy(norms_fused=True, online_had_down=True, fp32_had=True)
    got = np.asarray(F.forward(rotated, ids, cfg, pol))
    np.testing.assert_allclose(got, base, rtol=2e-3, atol=2e-3)


def test_falcon_quantize_pipeline_and_checkpoint(tmp_path, tiny_falcon):
    from rsq_tpu.core.quant import WeightQuantConfig
    from rsq_tpu.eval.ppl import ppl_fullmodel
    from rsq_tpu.quantize import data as D
    from rsq_tpu.quantize.checkpoint import load_quantized, save_quantized
    from rsq_tpu.quantize.pipeline import RSQConfig, quantize_model

    cfg, params = tiny_falcon
    calib = D.get_loaders("synthetic", nsamples=4, seqlen=24,
                          vocab_size=cfg.vocab_size)
    rsq = RSQConfig(w=WeightQuantConfig(bits=4), rotate=True, nsamples=4)
    qparams, quantizers = quantize_model(params, cfg, rsq, calib)
    assert "layers.0.fc2" in quantizers  # falcon group names

    stream = D.get_loaders("synthetic", eval_mode=True,
                           vocab_size=cfg.vocab_size)[:4096]
    pol = QuantPolicy(norms_fused=True, online_had_down=True)
    ppl_q = ppl_fullmodel(qparams, cfg, pol, stream, val_seqlen=24, bsz=4)
    assert np.isfinite(ppl_q)
    ppl_fp = ppl_fullmodel(params, cfg, FP16, stream, val_seqlen=24, bsz=4)
    assert ppl_q < ppl_fp * 2.0

    save_quantized(str(tmp_path / "ck"), qparams, quantizers, cfg,
                   meta={"rotate": True})
    p2, q2, cfg2, _ = load_quantized(str(tmp_path / "ck"))
    assert cfg2.family == "falcon"
    got = np.asarray(family.forward(p2, jnp.asarray(calib[:1]), cfg2, pol))
    want = np.asarray(family.forward(qparams, jnp.asarray(calib[:1]), cfg,
                                     pol))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_falcon_weighting_attncon(tiny_falcon):
    from rsq_tpu.quantize.weighting import (
        WeightingConfig, compute_sample_weight)
    cfg, params = tiny_falcon
    L = 16
    x = jax.random.normal(jax.random.PRNGKey(3), (L, cfg.hidden_size))
    out = jax.random.normal(jax.random.PRNGKey(4), (L, cfg.hidden_size))
    tf = jnp.ones((L,))
    w = np.asarray(compute_sample_weight(
        params["layers"][0], x, out, tf, cfg, FP16,
        WeightingConfig(method="attncon", min_value=0.005, max_value=1.0)))
    assert w.shape == (L,)
    assert (w >= 0.005 - 1e-6).all() and (w <= 1.0 + 1e-6).all()


def test_falcon_7b_dims_rotation_fallback():
    """Real falcon-7b dims have odd part 71 (no Hadamard for hidden 4544 /
    intermediate 18176): rotate_model must fall back to a random
    orthogonal Q and skip the down-projection Hadamard pair, staying
    invariant end-to-end."""
    cfg = ModelConfig.tiny_falcon(hidden_size=64, intermediate_size=142,
                                  num_attention_heads=4)
    params = F.init_params(cfg, jax.random.PRNGKey(7), scale=0.05)
    ids = jnp.asarray(np.random.default_rng(8).integers(0, 256, (2, 10)))
    base = np.asarray(F.forward(params, ids, cfg, FP16))
    rotated, _ = rotation.rotate_model(params, cfg, mode="hadamard", seed=0)
    pol = QuantPolicy(norms_fused=True, online_had_down=False, fp32_had=True)
    got = np.asarray(F.forward(rotated, ids, cfg, pol))
    np.testing.assert_allclose(got, base, rtol=2e-3, atol=2e-3)

    from rsq_tpu.core.quant import WeightQuantConfig
    from rsq_tpu.quantize import data as D
    from rsq_tpu.quantize.pipeline import RSQConfig, quantize_model
    calib = D.get_loaders("synthetic", nsamples=2, seqlen=16,
                          vocab_size=cfg.vocab_size)
    qp, _ = quantize_model(
        params, cfg, RSQConfig(w=WeightQuantConfig(bits=4), rotate=True,
                               nsamples=2), calib)
    assert np.isfinite(np.asarray(
        F.forward(qp, ids, cfg, QuantPolicy(norms_fused=True)))).all()
