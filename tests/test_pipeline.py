"""End-to-end RSQ pipeline on a tiny model: the SURVEY.md §7.2 minimum slice
plus rotation and weighting, with PPL sanity/regression bounds."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.core.quant import WeightQuantConfig
from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import FP16, QuantPolicy, KVQuantConfig
from rsq_tpu.core.quant import ActQuantConfig
from rsq_tpu.quantize import data as D
from rsq_tpu.quantize.pipeline import RSQConfig, quantize_model
from rsq_tpu.quantize.weighting import WeightingConfig
from rsq_tpu.eval.ppl import ppl_fullmodel, ppl_streamed


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig.tiny(num_layers=2)
    params = M.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    calib = D.get_loaders("synthetic", nsamples=8, seqlen=32,
                          vocab_size=cfg.vocab_size)
    evalstream = D.get_loaders("synthetic", eval_mode=True,
                               vocab_size=cfg.vocab_size)[:4096]
    return cfg, params, calib, evalstream


def test_w4_gptq_end_to_end(tiny_model):
    cfg, params, calib, evalstream = tiny_model
    rsq = RSQConfig(w=WeightQuantConfig(bits=4, sym=True), nsamples=8)
    qparams, quantizers = quantize_model(params, cfg, rsq, calib)

    assert f"layers.0.down" in quantizers
    assert quantizers["layers.0.q"]["bits"] == 4

    base = ppl_fullmodel(params, cfg, FP16, evalstream, val_seqlen=32, bsz=4)
    quant = ppl_fullmodel(qparams, cfg, FP16, evalstream, val_seqlen=32, bsz=4)
    assert np.isfinite(quant)
    # random tiny model: W4 must stay within a modest factor of FP PPL
    assert quant < base * 1.5


def test_rtn_end_to_end(tiny_model):
    cfg, params, calib, evalstream = tiny_model
    rsq = RSQConfig(w=WeightQuantConfig(bits=4, sym=True), nsamples=4,
                    w_rtn=True)
    qparams, _ = quantize_model(params, cfg, rsq, calib)
    quant = ppl_fullmodel(qparams, cfg, FP16, evalstream, val_seqlen=32, bsz=4)
    assert np.isfinite(quant)


def test_full_rsq_rotate_weight_quant(tiny_model):
    """rotate + attncon weighting + GPTQ + clip: the run_rsq.sh config."""
    cfg, params, calib, evalstream = tiny_model
    rsq = RSQConfig(
        w=WeightQuantConfig(bits=4, sym=True, mse=True),
        rotate=True,
        weighting=WeightingConfig(method="attncon", min_value=0.005,
                                  max_value=1.0),
        nsamples=8,
        gptq=dataclasses.replace(RSQConfig().gptq, add_until_fail=True))
    qparams, quantizers = quantize_model(params, cfg, rsq, calib)
    assert qparams["layers"][0]["input_norm"] is None  # fused

    policy = QuantPolicy(online_had_down=True, online_had_o=True,
                         norms_fused=True)
    base = ppl_fullmodel(params, cfg, FP16, evalstream, val_seqlen=32, bsz=4)
    quant = ppl_fullmodel(qparams, cfg, policy, evalstream, val_seqlen=32, bsz=4)
    assert np.isfinite(quant)
    assert quant < base * 1.5


def test_w4a4kv4_eval_policy(tiny_model):
    cfg, params, calib, evalstream = tiny_model
    rsq = RSQConfig(w=WeightQuantConfig(bits=4, sym=True), rotate=True,
                    nsamples=4)
    qparams, _ = quantize_model(params, cfg, rsq, calib)
    policy = QuantPolicy(
        a=ActQuantConfig(bits=4, sym=True),
        v=ActQuantConfig(bits=4, sym=True),
        k=KVQuantConfig(bits=4),
        online_had_down=True, online_had_o=True, norms_fused=True)
    quant = ppl_fullmodel(qparams, cfg, policy, evalstream, val_seqlen=32, bsz=4)
    assert np.isfinite(quant)


def test_layers_dont_quantize_and_overrides(tiny_model):
    cfg, params, calib, _ = tiny_model
    rsq = RSQConfig(w=WeightQuantConfig(bits=4, sym=True), nsamples=4,
                    layers_dont_quantize=(0,), int8_down_proj=True)
    qparams, quantizers = quantize_model(params, cfg, rsq, calib)
    assert "layers.0.q" not in quantizers  # skipped layer
    assert quantizers["layers.1.down"]["bits"] == 8
    # layer 0 weights unchanged
    np.testing.assert_array_equal(
        np.asarray(qparams["layers"][0]["q"]["w"]),
        np.asarray(params["layers"][0]["q"]["w"]))


def test_streamed_ppl_matches_fullmodel(tiny_model):
    cfg, params, _, evalstream = tiny_model
    a = ppl_fullmodel(params, cfg, FP16, evalstream[:2048], val_seqlen=32, bsz=4)
    b = ppl_streamed(params, cfg, FP16, evalstream[:2048], val_seqlen=32, bsz=4)
    assert a == pytest.approx(b, rel=1e-4)


def test_expand_dataset():
    seqs = np.arange(8).reshape(1, 8)
    out = D.expand_dataset(seqs, 4)
    assert out.shape == (4, 8)
    np.testing.assert_array_equal(out[1], np.roll(seqs[0], 2))


def test_retrieval_loader_hermetic():
    # offline synthetic-retrieval calibration (reference reads a pre-built
    # jsonl; ours synthesizes LongEval-lines prompts + hash tokenizer)
    seqs = D.get_loaders("retrieval", nsamples=3, seqlen=64, vocab_size=999)
    assert seqs.shape == (3, 64)
    assert seqs.dtype == np.int32
    assert (seqs >= 0).all() and (seqs < 999).all()
    # deterministic under the same seed
    seqs2 = D.get_loaders("retrieval", nsamples=3, seqlen=64, vocab_size=999)
    np.testing.assert_array_equal(seqs, seqs2)


def test_retrieval_loader_jsonl(tmp_path):
    import json
    p = tmp_path / "cases.jsonl"
    with open(p, "w") as f:
        for i in range(2):
            f.write(json.dumps({"prompt": f"line {i} " * 200}) + "\n")
    seqs = D.get_retrieval(4, seed=0, seqlen=32, vocab_size=100,
                           jsonl_path=str(p))
    assert seqs.shape == (4, 32)
