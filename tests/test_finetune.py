"""Finetune optimizer + scheduler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.core.quant import WeightQuantConfig
from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import FP16
from rsq_tpu.quantize import data as D
from rsq_tpu.quantize import finetune as F
from rsq_tpu.quantize import schedulers as Sch
from rsq_tpu.quantize.pipeline import RSQConfig, quantize_model, _layer_out


def test_ste_gradients():
    g = jax.grad(lambda x: F.round_ste(x) * 2.0)(jnp.float32(0.3))
    assert float(g) == 2.0  # identity gradient through round
    g2 = jax.grad(lambda x: F.clamp_ste(x, -1.0, 1.0))(jnp.float32(5.0))
    assert float(g2) == 1.0


def test_qat_fake_quant_grads_flow_to_scale():
    w = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)),
                    dtype=jnp.float32)
    scale = jnp.full((4, 1), 0.1, jnp.float32)

    def loss(s):
        return jnp.sum(F.qat_fake_quant(w, s, jnp.zeros_like(s), 4, True) ** 2)

    g = jax.grad(loss)(scale)
    assert np.abs(np.asarray(g)).max() > 0


def test_finetune_reduces_layer_mse():
    cfg = ModelConfig.tiny(num_layers=1)
    params = M.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    calib = D.get_loaders("synthetic", nsamples=8, seqlen=16,
                          vocab_size=cfg.vocab_size)
    # targets: ORIGINAL (unquantized) layer outputs
    inps = np.asarray(jax.jit(M.embed)(params, jnp.asarray(calib)))
    cos, sin = M.rope_tables(cfg, jnp.arange(16))
    mask = M.causal_mask(16)
    targets = np.stack([
        np.asarray(_layer_out(params["layers"][0], jnp.asarray(inps[j:j+1]),
                              cos, sin, cfg, FP16, mask)[0])
        for j in range(8)])

    # quantize at 3 bits, then PERTURB the quantizer scales — finetune must
    # recover most of the degradation (GPTQ's own solution is already a
    # local MSE optimum on a tiny random model, so we test recovery, not
    # improvement over GPTQ).
    rsq = RSQConfig(w=WeightQuantConfig(bits=3, sym=True), nsamples=8)
    qparams, quantizers = quantize_model(params, cfg, rsq, calib)
    lp = dict(qparams["layers"][0])

    bad_quantizers = {}
    for k, v in quantizers.items():
        bad_quantizers[k] = dict(v, scale=np.asarray(v["scale"]) * 1.4)
    # rebuild weights with the damaged scales (simulates a bad checkpoint)
    from rsq_tpu.quantize.finetune import qat_fake_quant
    for name in ("q", "k", "v", "o", "up", "gate", "down"):
        info = bad_quantizers[f"layers.0.{name}"]
        w = jnp.asarray(lp[name]["w"], jnp.float32).T
        wq = qat_fake_quant(w, jnp.asarray(info["scale"]).reshape(-1, 1),
                            jnp.zeros((w.shape[0], 1)), 3, True)
        lp[name] = {"w": wq.T, "b": lp[name].get("b")}

    def layer_mse(lp_):
        outs = np.stack([
            np.asarray(_layer_out(lp_, jnp.asarray(inps[j:j+1]), cos, sin,
                                  cfg, FP16, mask)[0])
            for j in range(8)])
        return float(np.mean((outs - targets) ** 2))

    before = layer_mse(lp)
    new_lp, info = F.finetune_layer(
        lp, bad_quantizers, 0, inps, targets, cfg, FP16,
        F.FinetuneConfig(max_epochs=8, quant_lr=3e-3, weight_lr=1e-4))
    after = layer_mse(new_lp)
    assert after < before * 0.9


def test_schedulers():
    for name, kw in [("linear", dict(start_value=1.0, end_value=3.0)),
                     ("endpoints_peak", dict(min_value=0.5, max_value=2.0)),
                     ("start_peak", dict(min_value=0.5, max_value=2.0))]:
        s = Sch.make_scheduler(name, **kw)
        w = s.get_ratio(64)
        assert w.shape == (64,)
        assert np.isfinite(w).all()
    lin = Sch.make_scheduler("linear", start_value=1.0, end_value=3.0).get_ratio(10)
    assert lin[0] == pytest.approx(1.0) and lin[-1] == pytest.approx(3.0)
    sp = Sch.make_scheduler("start_peak", min_value=0.0, max_value=1.0).get_ratio(10)
    assert sp[0] == pytest.approx(1.0) and sp[-1] == pytest.approx(0.0)
    ep = Sch.make_scheduler("endpoints_peak", min_value=0.0, max_value=1.0).get_ratio(11)
    assert ep[0] == pytest.approx(1.0) and ep[-1] == pytest.approx(1.0)
    assert ep[5] < 0.1


@pytest.mark.parametrize("on_prob", [True, False])
def test_finetune_attn_loss(on_prob):
    # attention-matrix loss (optimizers.py:146-168): KL on probs / MSE on
    # causal-valid logits vs the unquantized layer
    cfg = ModelConfig.tiny(num_layers=1)
    params = M.init_params(cfg, jax.random.PRNGKey(1), scale=0.05)
    calib = D.get_loaders("synthetic", nsamples=4, seqlen=12,
                          vocab_size=cfg.vocab_size)
    inps = np.asarray(jax.jit(M.embed)(params, jnp.asarray(calib)))
    cos, sin = M.rope_tables(cfg, jnp.arange(12))
    mask = M.causal_mask(12)
    targets = np.stack([
        np.asarray(_layer_out(params["layers"][0], jnp.asarray(inps[j:j+1]),
                              cos, sin, cfg, FP16, mask)[0])
        for j in range(4)])
    rsq = RSQConfig(w=WeightQuantConfig(bits=3, sym=True), nsamples=4)
    qparams, quantizers = quantize_model(params, cfg, rsq, calib)
    ft = F.FinetuneConfig(max_epochs=2, early_stop=2, attn_loss=True,
                          attn_loss_on_prob=on_prob, attn_loss_weight=0.5)
    _, info = F.finetune_layer(qparams["layers"][0], quantizers, 0, inps,
                               targets, cfg, FP16, ft)
    assert np.isfinite(info["val_loss"])
