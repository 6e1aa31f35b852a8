"""Serving engine tests: dense serving path == fake-quant model forward;
quantized paths stay within quantization noise; prefill/decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.core.quant import WeightQuantConfig
from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import FP16
from rsq_tpu.quantize import data as D
from rsq_tpu.quantize.pipeline import RSQConfig, quantize_model
from rsq_tpu.serving import model as S
from rsq_tpu.serving.params import to_serving_params, pack_linear, unpack_linear


@pytest.fixture(scope="module")
def quantized_tiny():
    cfg = ModelConfig.tiny(num_layers=2, intermediate_size=128)
    params = M.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    calib = D.get_loaders("synthetic", nsamples=4, seqlen=32,
                          vocab_size=cfg.vocab_size)
    rsq = RSQConfig(w=WeightQuantConfig(bits=4, sym=True), nsamples=4)
    qparams, quantizers = quantize_model(params, cfg, rsq, calib)
    sparams = to_serving_params(qparams, quantizers, cfg)
    return cfg, params, qparams, quantizers, sparams


def test_pack_linear_bit_exact(quantized_tiny):
    """Packed codes * scale must reproduce the fake-quant weights exactly
    (the reference's equivalence assert, gptq_utils.py:622-625)."""
    cfg, _, qparams, quantizers, _ = quantized_tiny
    lp = qparams["layers"][0]["q"]
    sp = pack_linear(lp, quantizers["layers.0.q"]["scale"])
    np.testing.assert_allclose(np.asarray(unpack_linear(sp)),
                               np.asarray(lp["w"], dtype=np.float32),
                               rtol=1e-6, atol=1e-6)


def test_dense_serving_matches_fake_quant_forward(quantized_tiny):
    """Serving prefill with dense weights + fp cache == model forward."""
    cfg, params, qparams, quantizers, _ = quantized_tiny
    # dense serving params: no quantizer info
    sparams = to_serving_params(qparams, {}, cfg)
    sc = S.ServingConfig(model=cfg, a4=False, kv_int4=False,
                         kv_hadamard=False, online_had=False, max_seq=64)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 16)))
    cache = S.init_cache(sc, 2)
    logits, cache = S.prefill(sparams, cache, ids, sc)
    want = M.forward(qparams, ids, cfg, FP16)[:, -1]
    np.testing.assert_allclose(np.asarray(logits, dtype=np.float32),
                               np.asarray(want, dtype=np.float32),
                               rtol=2e-2, atol=2e-2)
    assert int(cache["length"][0]) == 16


def test_decode_matches_incremental_forward(quantized_tiny):
    """Dense-path decode steps produce the same logits as re-running the
    full forward with the grown prompt."""
    cfg, params, qparams, _, _ = quantized_tiny
    sparams = to_serving_params(qparams, {}, cfg)
    sc = S.ServingConfig(model=cfg, a4=False, kv_int4=False,
                         kv_hadamard=False, online_had=False, max_seq=64)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, (1, 8))
    cache = S.init_cache(sc, 1)
    logits, cache = S.prefill(sparams, jnp.asarray(cache) if False else cache,
                              jnp.asarray(ids), sc)
    toks = [int(jnp.argmax(logits[0]))]
    for _ in range(3):
        logits, cache = S.decode_step(sparams, cache,
                                      jnp.asarray([toks[-1]]), sc)
        toks.append(int(jnp.argmax(logits[0])))

    # oracle: full forward over growing sequence
    seq = list(ids[0])
    want = []
    for _ in range(4):
        full = M.forward(qparams, jnp.asarray([seq]), cfg, FP16)
        nxt = int(jnp.argmax(full[0, -1]))
        want.append(nxt)
        seq.append(nxt)
    assert toks == want


def test_int4_serving_close_to_fake_quant(quantized_tiny):
    """W4(A4)KV4 serving logits track the fake-quant logits."""
    cfg, params, qparams, quantizers, sparams = quantized_tiny
    sc = S.ServingConfig(model=cfg, a4=True, kv_int4=True, kv_hadamard=True,
                         online_had=False, max_seq=64)
    ids = jnp.asarray(np.random.default_rng(2).integers(
        0, cfg.vocab_size, (2, 12)))
    cache = S.init_cache(sc, 2)
    logits, cache = S.prefill(sparams, cache, ids, sc)
    want = M.forward(qparams, ids, cfg, FP16)[:, -1]
    # int4 activations + cache add noise, but ranking should mostly agree
    corr = np.corrcoef(np.asarray(logits, np.float32).ravel(),
                       np.asarray(want, np.float32).ravel())[0, 1]
    assert corr > 0.98

    # a decode step runs and returns finite logits
    logits2, cache = S.decode_step(sparams, cache,
                                   jnp.argmax(logits, axis=-1), sc)
    assert np.isfinite(np.asarray(logits2, np.float32)).all()


def test_generate_runs(quantized_tiny):
    cfg, _, qparams, quantizers, sparams = quantized_tiny
    sc = S.ServingConfig(model=cfg, a4=True, kv_int4=True, kv_hadamard=True,
                         online_had=False, max_seq=64)
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab_size, (2, 8)))
    toks = S.generate(sparams, ids, sc, max_new_tokens=5)
    assert toks.shape == (2, 5)
    assert (np.asarray(toks) >= 0).all()


def test_e8p_serving_linear():
    """2-bit E8P serving path: quantize one linear with LDLQ, serve it."""
    import jax
    from rsq_tpu.quantize.ldlq import ldlq_quantize
    from rsq_tpu.serving.params import pack_linear_e8p
    from rsq_tpu.serving.model import serving_linear, ServingConfig
    from rsq_tpu.models.config import ModelConfig

    rng = np.random.default_rng(7)
    W = jnp.asarray((rng.standard_normal((16, 32)) * 0.1).astype(np.float32))
    A = rng.standard_normal((64, 16)).astype(np.float32)
    H = jnp.asarray((2.0 / 64) * A.T @ A + 0.05 * np.eye(16, dtype=np.float32))
    # quantize W^T (out=32, in=16) in GPTQ convention
    Q, info = ldlq_quantize(W.T, H, quip_tune_iters=1)
    sp = pack_linear_e8p({"w": W, "b": None},
                         {"codes": info["codes"], "scale": info["scale"]})
    sc = ServingConfig(model=ModelConfig.tiny(), a4=False, kv_int4=False)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    y = serving_linear(x, sp, sc)
    want = x @ Q.T  # dequantized weights, (in, out)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-3, atol=1e-3)


def test_fused_qkv_upgate_matches_unfused(quantized_tiny):
    """fuse_for_decode (one kernel per qkv / up-gate group) must reproduce
    the unfused path bit-for-bit at the logits level."""
    from rsq_tpu.serving.params import fuse_for_decode
    cfg, _, qparams, quantizers, sparams = quantized_tiny
    sc = S.ServingConfig(model=cfg, a4=True, kv_int4=True, kv_hadamard=True,
                         online_had=True, max_seq=64)
    ids = jnp.asarray(np.random.default_rng(9).integers(
        0, cfg.vocab_size, (2, 8)))

    cache0 = S.init_cache(sc, 2)
    logits0, cache0 = S.prefill(sparams, cache0, ids, sc)
    tok0 = jnp.argmax(logits0, axis=-1)
    logits0b, _ = S.decode_step(sparams, cache0, tok0, sc)

    fused = fuse_for_decode(sparams)
    assert "qkv" in fused["layers"][0] and "upgate" in fused["layers"][0]
    cache1 = S.init_cache(sc, 2)
    logits1, cache1 = S.prefill(fused, cache1, ids, sc)
    logits1b, _ = S.decode_step(fused, cache1, tok0, sc)

    np.testing.assert_allclose(np.asarray(logits0, np.float32),
                               np.asarray(logits1, np.float32),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits0b, np.float32),
                               np.asarray(logits1b, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_fused_stacked_decode(quantized_tiny):
    """Fused layers must survive stack_layer_params + scan decode."""
    from rsq_tpu.serving.params import fuse_for_decode
    cfg, _, qparams, quantizers, sparams = quantized_tiny
    sc = S.ServingConfig(model=cfg, a4=True, kv_int4=True, kv_hadamard=True,
                         online_had=False, max_seq=64)
    ids = jnp.asarray(np.random.default_rng(10).integers(
        0, cfg.vocab_size, (2, 8)))
    fused = fuse_for_decode(sparams)

    cache = S.init_cache(sc, 2)
    logits, cache = S.prefill(fused, cache, ids, sc)
    tok = jnp.argmax(logits, axis=-1)
    want, _ = S.decode_step(fused, cache, tok, sc)

    stacked = S.stack_layer_params(fused)
    cache2 = S.init_cache(sc, 2)
    logits2, cache2 = S.prefill_stacked(stacked, cache2, ids, sc)
    got, _ = S.decode_step_stacked(stacked, cache2, jnp.argmax(logits2, -1), sc)
    # scan bodies fuse differently than unrolled layers under a4 (int4
    # activation tie-flips cascade) — same comparison as
    # test_serving_stacked.test_stacked_matches_unrolled
    a = np.asarray(want, np.float32).ravel()
    b = np.asarray(got, np.float32).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.98
    assert np.max(np.abs(a - b)) < 0.5


def test_fuse_for_decode_skips_e8p_layers():
    """ADVICE r2 #2: E8P affine entries ("wp" + "sh", no "scale") must not
    be fused — fusing would KeyError or silently drop the +0.5 offset."""
    from rsq_tpu.quantize.ldlq import ldlq_quantize
    from rsq_tpu.serving.params import fuse_for_decode, pack_linear_e8p

    rng = np.random.default_rng(13)
    W = jnp.asarray((rng.standard_normal((16, 32)) * 0.1).astype(np.float32))
    A = rng.standard_normal((64, 16)).astype(np.float32)
    H = jnp.asarray((2.0 / 64) * A.T @ A + 0.05 * np.eye(16, dtype=np.float32))
    _, info = ldlq_quantize(W.T, H, quip_tune_iters=0)
    e8p_lin = pack_linear_e8p({"w": W, "b": None},
                              {"codes": info["codes"],
                               "scale": info["scale"]})
    params = {"embed": jnp.zeros((8, 16)), "final_norm": None,
              "lm_head": jnp.zeros((16, 8)),
              "layers": [{"input_norm": None, "post_norm": None,
                          "q": dict(e8p_lin), "k": dict(e8p_lin),
                          "v": dict(e8p_lin), "o": dict(e8p_lin),
                          "up": dict(e8p_lin), "gate": dict(e8p_lin),
                          "down": dict(e8p_lin)}]}
    fused = fuse_for_decode(params)          # must not raise
    lp = fused["layers"][0]
    assert "qkv" not in lp and "upgate" not in lp
    assert "sh" in lp["q"]
