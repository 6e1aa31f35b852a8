"""Stacked (lax.scan over layers) serving must equal the unrolled path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.core.quant import WeightQuantConfig
from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.quantize import data as D
from rsq_tpu.quantize.pipeline import RSQConfig, quantize_model
from rsq_tpu.serving import model as S
from rsq_tpu.serving.params import to_serving_params


@pytest.mark.parametrize("a4,kv_int4,kv_had", [
    (True, True, True), (False, False, False),
    # bf16 cache with the DEFAULT kv_hadamard=True: the fast decode body
    # must not rotate q against the unrotated bf16 prefill keys (ADVICE r4
    # #2 — a measured 0.16 max-logit regression before the gate)
    (False, False, True),
])
def test_stacked_matches_unrolled(a4, kv_int4, kv_had):
    cfg = ModelConfig.tiny(num_layers=3, intermediate_size=128)
    params = M.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    calib = D.get_loaders("synthetic", nsamples=2, seqlen=16,
                          vocab_size=cfg.vocab_size)
    rsq = RSQConfig(w=WeightQuantConfig(bits=4, sym=True), nsamples=2)
    qparams, quantizers = quantize_model(params, cfg, rsq, calib)
    sparams = to_serving_params(qparams, quantizers, cfg)
    stacked = S.stack_layer_params(sparams)

    sc = S.ServingConfig(model=cfg, a4=a4, kv_int4=kv_int4,
                         kv_hadamard=kv_had, online_had=False, max_seq=32)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)))

    # scan bodies fuse differently than unrolled layers, so bf16 rounding
    # differs slightly (and int4 codes can tie-flip); compare within noise.
    c0 = S.init_cache(sc, 2)
    l0, c0 = S.prefill(sparams, c0, ids, sc)
    c1 = S.init_cache(sc, 2)
    l1, c1 = S.prefill_stacked(stacked, c1, ids, sc)
    def close(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if a4:
            # int4 activation tie-flips under different fusion rounding
            # cascade through layers; require strong agreement, not equality
            corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
            assert corr > 0.98, corr
            assert np.max(np.abs(a - b)) < 0.5
        else:
            np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)

    close(l0, l1)
    assert c0.keys() == c1.keys()
    np.testing.assert_array_equal(np.asarray(c0["length"]),
                                  np.asarray(c1["length"]))
    if kv_int4:
        from rsq_tpu.kernels import kv_cache as KVK
        for qk, pk in (("kq", "kp"), ("vq", "vp")):
            a = KVK.unpack_dequant_head(
                jnp.swapaxes(c0[qk], -1, -2), jnp.swapaxes(c0[pk], -1, -2))
            b = KVK.unpack_dequant_head(
                jnp.swapaxes(c1[qk], -1, -2), jnp.swapaxes(c1[pk], -1, -2))
            close(a, b)

    tok = jnp.argmax(l0, axis=-1)
    l0b, c0 = S.decode_step(sparams, c0, tok, sc)
    l1b, c1 = S.decode_step_stacked(stacked, c1, tok, sc)
    close(l0b, l1b)


def test_int8_lm_head_close_to_bf16():
    """quantize_lm_head: decode logits with the int8 head must track the
    bf16 head closely (same argmax on non-tied rows; small max error)."""
    cfg = ModelConfig.tiny(num_layers=2, intermediate_size=128)
    params = M.init_params(cfg, jax.random.PRNGKey(4), scale=0.05)
    sparams = to_serving_params(params, {}, cfg)
    stacked = S.stack_layer_params(sparams)
    sc = S.ServingConfig(model=cfg, a4=False, kv_int4=True,
                         kv_hadamard=True, online_had=False, max_seq=64)
    ids = jnp.asarray(np.random.default_rng(4).integers(
        0, cfg.vocab_size, (2, 8)))

    c0 = S.init_cache(sc, 2)
    l0, c0 = S.prefill_fast(stacked, c0, ids, sc)
    tok = jnp.argmax(l0, axis=-1)
    d0, _ = S.decode_step_stacked(stacked, c0, tok, sc)

    q = S.quantize_lm_head(stacked)
    c1 = S.init_cache(sc, 2)
    l1, c1 = S.prefill_fast(q, c1, ids, sc)
    d1, _ = S.decode_step_stacked(q, c1, tok, sc)

    for a, b in ((l0, l1), (d0, d1)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999
        assert np.max(np.abs(a - b)) < 0.1


def test_int4_lm_head_dispatch():
    """quantize_lm_head(bits=4) packs a planar-int4 head served by the w4
    kernel; measured PPL cost at real head dims is +0.51% (vs int8's
    +0.006%, benchmarks/lmhead_ppl.py) so it is opt-in — this guards the
    dispatch and the pack/serve round trip."""
    from rsq_tpu.serving.model import lm_head_logits, quantize_lm_head

    rng = np.random.default_rng(0)
    d, V = 64, 256
    params = {"lm_head": jnp.asarray(
        rng.standard_normal((d, V)) * 0.05, jnp.bfloat16)}
    x = jnp.asarray(rng.standard_normal((4, d)), jnp.bfloat16)
    want = np.asarray(lm_head_logits(params, x), np.float32)
    p4 = quantize_lm_head(dict(params), bits=4)
    assert "lm_head" not in p4 and "lm_head_wp" in p4
    got = np.asarray(lm_head_logits(p4, x), np.float32)
    corr = np.corrcoef(want.ravel(), got.ravel())[0, 1]
    assert corr > 0.99, corr  # int4 quant noise at tiny dims
