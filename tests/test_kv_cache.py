"""INT4 KV-cache decode kernel vs pure-jnp oracle (f16-twin pattern)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.kernels import kv_cache as KV


def _mk_cache(B, Hkv, S, D, seed=0):
    rng = np.random.default_rng(seed)
    k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    kq, kp = KV.to_lane_major(*KV.asym_quant_pack_head(jnp.asarray(k)))
    vq, vp = KV.to_lane_major(*KV.asym_quant_pack_head(jnp.asarray(v)))
    return k, v, kq, kp, vq, vp


def test_quant_pack_roundtrip_error():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 2, 16, 32)).astype(np.float32))
    packed, params = KV.asym_quant_pack_head(x)
    back = KV.unpack_dequant_head(packed, params)
    # max error = half LSB of per-(token,head) scale
    err = jnp.abs(back - x)
    scale = params[..., 0:1]
    assert float(jnp.max(err / scale)) <= 0.5 + 1e-3


@pytest.mark.parametrize("B,Hq,Hkv,S,D,chunk", [
    (2, 4, 2, 64, 32, 16),     # GQA x2
    (1, 8, 8, 32, 64, 16),     # MHA
    (3, 8, 1, 48, 32, 16),     # MQA
])
def test_decode_matches_oracle(B, Hq, Hkv, S, D, chunk):
    rng = np.random.default_rng(2)
    _, _, kq, kp, vq, vp = _mk_cache(B, Hkv, S, D)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, S + 1, size=(B,)), jnp.int32)
    got = KV.int4_decode_attention(q, kq, kp, vq, vp, lengths, chunk=chunk,
                                   interpret=True)
    want = KV.int4_decode_attention_reference(q, kq, kp, vq, vp, lengths)
    # kernel uses bf16 MXU feeds (intended; ~0.4% rounding, far below the
    # int4 cache quantization noise) — tolerance reflects that
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-2, atol=1e-2)


def test_decode_respects_lengths():
    """Tokens beyond `length` must not influence the output."""
    B, Hq, Hkv, S, D = 1, 2, 2, 32, 32
    rng = np.random.default_rng(3)
    k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))

    # poison the tail
    k2 = k.copy(); k2[:, :, 10:] = 1e3
    v2 = v.copy(); v2[:, :, 10:] = -1e3

    outs = []
    for kk, vv in [(k, v), (k2, v2)]:
        kq, kp = KV.to_lane_major(*KV.asym_quant_pack_head(jnp.asarray(kk)))
        vq, vp = KV.to_lane_major(*KV.asym_quant_pack_head(jnp.asarray(vv)))
        outs.append(np.asarray(KV.int4_decode_attention(
            q, kq, kp, vq, vp, jnp.asarray([10], jnp.int32), chunk=16,
            interpret=True)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)


def test_decode_vs_fp_attention_quality():
    """INT4 cache attention must stay close to FP attention (quantization
    noise only)."""
    B, Hq, Hkv, S, D = 2, 4, 2, 64, 64
    rng = np.random.default_rng(4)
    k, v, kq, kp, vq, vp = _mk_cache(B, Hkv, S, D, seed=5)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    lengths = jnp.asarray([64, 40], jnp.int32)
    got = np.asarray(KV.int4_decode_attention(q, kq, kp, vq, vp, lengths,
                                              chunk=32, interpret=True))
    # fp oracle on the unquantized cache
    import math
    qg = np.asarray(q).reshape(B, Hkv, 2, D)
    logits = np.einsum("bhgd,bhsd->bhgs", qg, k) / math.sqrt(D)
    mask = np.arange(S)[None, None, None, :] < np.asarray(lengths)[:, None, None, None]
    logits = np.where(mask, logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhgs,bhsd->bhgd", p, v).reshape(B, Hq, D)
    np.testing.assert_allclose(got, want, rtol=0.15, atol=0.15)
    assert np.abs(got - want).mean() < 0.05


def test_pick_chunk_divides_and_prefers_lane_alignment():
    from rsq_tpu.kernels.kv_cache import pick_chunk
    for S in (512, 640, 1000, 1024, 4352, 4096, 384, 131):
        ch = pick_chunk(S, 512)
        assert S % ch == 0 and ch <= max(512, S)
    assert pick_chunk(640, 512) == 128      # largest 128-aligned divisor
    assert pick_chunk(1024, 512) == 512
    assert pick_chunk(1000, 512) == 500     # no aligned divisor -> any
    assert pick_chunk(131, 512) == 131      # prime -> whole sequence


def test_stacked_decode_odd_max_seq():
    """ADVICE r2 #1: stacked attention must accept S not divisible by 512."""
    import jax
    rng = np.random.default_rng(9)
    L, B, Hkv, G, D, S = 2, 2, 2, 2, 64, 640
    Hq = Hkv * G
    kq = jnp.asarray(rng.integers(0, 256, (L, B, Hkv, D // 2, S)), jnp.uint8)
    vq = jnp.asarray(rng.integers(0, 256, (L, B, Hkv, D // 2, S)), jnp.uint8)
    kp = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, Hkv, 2, S)), jnp.float32)
    vp = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, Hkv, 2, S)), jnp.float32)
    lengths = jnp.asarray([600, 637], jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    out, m, l = KV.int4_decode_attention_stacked(
        q, kq, kp, vq, vp, 1, lengths)
    ref = KV.int4_decode_attention_reference(
        q, kq[1], kp[1], vq[1], vp[1], lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_kv_append_stacked_matches_scatter():
    """Aliased Pallas append == the batched scatter it replaces."""
    import jax
    rng = np.random.default_rng(11)
    L, B, H, D2, S = 3, 4, 2, 8, 384
    kq = jnp.asarray(rng.integers(0, 256, (L, B, H, D2, S)), jnp.uint8)
    kp = jnp.asarray(rng.uniform(0.01, 1, (L, B, H, 2, S)), jnp.float32)
    vq = jnp.asarray(rng.integers(0, 256, (L, B, H, D2, S)), jnp.uint8)
    vp = jnp.asarray(rng.uniform(0.01, 1, (L, B, H, 2, S)), jnp.float32)
    pos = jnp.asarray([0, 127, 128, 383], jnp.int32)
    nkq = jnp.asarray(rng.integers(0, 256, (B, H, D2, 1)), jnp.uint8)
    nkp = jnp.asarray(rng.uniform(0.01, 1, (B, H, 2, 1)), jnp.float32)
    nvq = jnp.asarray(rng.integers(0, 256, (B, H, D2, 1)), jnp.uint8)
    nvp = jnp.asarray(rng.uniform(0.01, 1, (B, H, 2, 1)), jnp.float32)
    layer = 1
    okq, okp, ovq, ovp = KV.kv_append_stacked(
        kq, kp, vq, vp, layer, pos, nkq, nkp, nvq, nvp)
    bidx = jnp.arange(B)
    for out, cache, new in ((okq, kq, nkq), (okp, kp, nkp),
                            (ovq, vq, nvq), (ovp, vp, nvp)):
        want = cache.at[layer, bidx, :, :, pos].set(new[..., 0])
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_bf16_decode_attention_stacked_matches_reference():
    """16-bit stacked flash-decode kernel == dense masked-softmax oracle."""
    rng = np.random.default_rng(12)
    L, B, Hkv, G, D, S = 3, 2, 2, 4, 128, 384
    Hq = Hkv * G
    k = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)) * 0.3,
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)) * 0.3,
                    jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)) * 0.3, jnp.bfloat16)
    lengths = jnp.asarray([200, 384], jnp.int32)

    out, m, l = KV.bf16_decode_attention_stacked(q, k, v, 1, lengths)

    kf = np.asarray(k[1], np.float32)
    vf = np.asarray(v[1], np.float32)
    qg = np.asarray(q, np.float32).reshape(B, Hkv, G, D) / np.sqrt(D)
    logits = np.einsum("bhgd,bhsd->bhgs", qg, kf)
    mask = np.arange(S)[None, None, None, :] < np.asarray(lengths)[:, None,
                                                                   None, None]
    logits = np.where(mask, logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bhgs,bhsd->bhgd", p, vf).reshape(B, Hq, D)
    np.testing.assert_allclose(np.asarray(out, np.float32), want,
                               rtol=2e-2, atol=2e-2)
    # emitted online-softmax state matches the direct masked stats (the
    # kernel rounds q to bf16 for the MXU; the oracle is f32)
    np.testing.assert_allclose(np.asarray(m), logits.max(-1),
                               rtol=2e-2, atol=2e-2)


def test_kv_append_stacked_bf16_matches_scatter():
    rng = np.random.default_rng(13)
    L, B, H, S, D = 3, 4, 2, 384, 128
    k = jnp.asarray(rng.standard_normal((L, B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((L, B, H, S, D)), jnp.bfloat16)
    pos = jnp.asarray([0, 7, 8, 383], jnp.int32)
    nk = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.bfloat16)
    nv = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.bfloat16)
    layer = 2
    ok, ov = KV.kv_append_stacked_bf16(k, v, layer, pos, nk, nv)
    bidx = jnp.arange(B)
    for out, cache, new in ((ok, k, nk), (ov, v, nv)):
        want = cache.at[layer, bidx, :, pos, :].set(new[:, :, 0, :])
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_stacked_decode_self_fold_matches_append_then_attend():
    """int4_decode_attention_stacked_self must equal attending over a cache
    with the new token already appended (the in-kernel self fold is one more
    step of the same online softmax)."""
    L, B, Hkv, G, D, S = 3, 4, 2, 4, 128, 256
    Hq = Hkv * G
    rng = np.random.default_rng(7)
    kq = jnp.asarray(rng.integers(0, 256, (L, B, Hkv, D // 2, S)), jnp.uint8)
    vq = jnp.asarray(rng.integers(0, 256, (L, B, Hkv, D // 2, S)), jnp.uint8)
    kp = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, Hkv, 2, S)), jnp.float32)
    vp = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, Hkv, 2, S)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    lengths = jnp.asarray([100, 1, S - 1, 77], jnp.int32)

    knew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
    vnew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
    kq_t, kp_t = KV.asym_quant_pack_head(knew)
    vq_t, vp_t = KV.asym_quant_pack_head(vnew)
    k_self = KV.unpack_dequant_head(kq_t, kp_t)[:, :, 0]
    v_self = KV.unpack_dequant_head(vq_t, vp_t)[:, :, 0]

    layer = 1
    got = KV.int4_decode_attention_stacked_self(
        q, kq, kp, vq, vp, layer, lengths, k_self, v_self,
        chunk=128, interpret=True)

    # oracle: write the quantized token into the dense cache, then attend
    kq_lm, kp_lm = KV.to_lane_major(kq_t, kp_t)
    vq_lm, vp_lm = KV.to_lane_major(vq_t, vp_t)
    kq1, kp1, vq1, vp1 = [np.array(x[layer]) for x in (kq, kp, vq, vp)]
    for b in range(B):
        p = int(lengths[b])
        kq1[b, :, :, p] = np.array(kq_lm)[b, :, :, 0]
        kp1[b, :, :, p] = np.array(kp_lm)[b, :, :, 0]
        vq1[b, :, :, p] = np.array(vq_lm)[b, :, :, 0]
        vp1[b, :, :, p] = np.array(vp_lm)[b, :, :, 0]
    want = KV.int4_decode_attention_reference(
        q, jnp.asarray(kq1), jnp.asarray(kp1), jnp.asarray(vq1),
        jnp.asarray(vp1), lengths + 1)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=2e-2)


def test_stacked_decode_self_fold_empty_cache():
    """length == 0: the output must be exactly v_self (softmax over the one
    self token)."""
    L, B, Hkv, G, D, S = 1, 2, 2, 2, 64, 128
    Hq = Hkv * G
    rng = np.random.default_rng(9)
    kq = jnp.zeros((L, B, Hkv, D // 2, S), jnp.uint8)
    vq = jnp.zeros((L, B, Hkv, D // 2, S), jnp.uint8)
    kp = jnp.full((L, B, Hkv, 2, S), 0.05, jnp.float32)
    vp = jnp.full((L, B, Hkv, 2, S), 0.05, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    lengths = jnp.zeros((B,), jnp.int32)
    k_self = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    v_self = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    got = KV.int4_decode_attention_stacked_self(
        q, kq, kp, vq, vp, 0, lengths, k_self, v_self,
        chunk=128, interpret=True)
    want = jnp.repeat(v_self, G, axis=1)  # (B, Hq, D)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_contiguous_fused_self_append_matches_separate():
    """int4_decode_attention_self_append == stacked_self attention then
    kv_append_stacked, covering mid-chunk, chunk-boundary and empty-cache
    slots (contiguous twin of the paged fused kernel)."""
    rng = np.random.default_rng(23)
    L, B, Hkv, D, S = 2, 3, 2, 64, 256  # ch = 128 (pick_chunk of 256@512?)
    kq = jnp.asarray(rng.integers(0, 256, (L, B, Hkv, D // 2, S),
                                  dtype=np.uint8))
    kp = jnp.asarray(np.stack(
        [rng.uniform(0.01, 0.2, (L, B, Hkv, S)),
         rng.uniform(-0.5, 0.5, (L, B, Hkv, S))], axis=3).astype(np.float32))
    vq = jnp.asarray(rng.integers(0, 256, (L, B, Hkv, D // 2, S),
                                  dtype=np.uint8))
    vp = jnp.asarray(np.stack(
        [rng.uniform(0.01, 0.2, (L, B, Hkv, S)),
         rng.uniform(-0.5, 0.5, (L, B, Hkv, S))], axis=3).astype(np.float32))
    # ch = pick_chunk(256, 512) = 256 -> single chunk; also test chunk=128
    for chunk in (128, 256):
        ch = KV.pick_chunk(S, chunk)
        lengths = jnp.asarray([ch - 1, min(ch, S - 1), 0],
                              jnp.int32)[:B]
        q = jnp.asarray(rng.standard_normal((B, Hkv * 2, D))
                        .astype(np.float32))
        knew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D))
                           .astype(np.float32))
        vnew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D))
                           .astype(np.float32))
        nkq_t, nkp_t = KV.asym_quant_pack_head(knew)
        nvq_t, nvp_t = KV.asym_quant_pack_head(vnew)
        k_self = KV.unpack_dequant_head(nkq_t, nkp_t)[:, :, 0]
        v_self = KV.unpack_dequant_head(nvq_t, nvp_t)[:, :, 0]
        nkq, nkp = KV.to_lane_major(nkq_t, nkp_t)
        nvq, nvp = KV.to_lane_major(nvq_t, nvp_t)

        for i in range(L):
            out_f, kq2, kp2, vq2, vp2 = KV.int4_decode_attention_self_append(
                q, kq, kp, vq, vp, i, lengths, k_self, v_self,
                nkq, nkp, nvq, nvp, chunk=chunk)
            out_s = KV.int4_decode_attention_stacked_self(
                q, kq, kp, vq, vp, i, lengths, k_self, v_self, chunk=chunk)
            np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                                       rtol=1e-5, atol=1e-5)
            kq3, kp3, vq3, vp3 = KV.kv_append_stacked(
                kq, kp, vq, vp, i, lengths, nkq, nkp, nvq, nvp)
            for got, want, name in ((kq2, kq3, "kq"), (kp2, kp3, "kp"),
                                    (vq2, vq3, "vq"), (vp2, vp3, "vp")):
                g, w = np.asarray(got), np.asarray(want)
                for b in range(B):
                    pos = int(lengths[b])
                    np.testing.assert_array_equal(
                        g[i, b, :, :, pos], w[i, b, :, :, pos],
                        err_msg=f"{name} slot {b} ch {ch} written lane")
                    # same-chunk lanes before pos preserved
                    lo = (pos // ch) * ch
                    np.testing.assert_array_equal(
                        g[i, b, :, :, lo:pos], w[i, b, :, :, lo:pos])


def test_decode_prep_matches_reference_chain():
    """The fused prep kernel (rope + per-head hadamard + KV quant-pack +
    self dequant in one Pallas call) must match the op-by-op reference
    chain it replaced (trace r5: that chain was most of the ~0.8 ms/step
    decode residue)."""
    import numpy as np
    from rsq_tpu.core.hadamard import hadamard_transform_last
    from rsq_tpu.models import llama as M
    from rsq_tpu.models.config import ModelConfig

    B, Hq, Hkv, D = 2, 8, 2, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    cfg = ModelConfig.llama3_8b()  # head_dim 128 matches D
    pos = jnp.asarray([3, 7], jnp.int32)
    cos, sin = M.rope_tables(cfg, pos)  # (B, D)

    qh, ks, vs, nkq, nkp, nvq, nvp = KV.decode_prep(
        q, k, v, cos, sin, kv_had=True)

    # reference chain (the pre-r5 decode body)
    qr = M.apply_rope(q[:, None], cos[:, None], sin[:, None])[:, 0]
    kr = M.apply_rope(k[:, None], cos[:, None], sin[:, None])[:, 0]
    qr = hadamard_transform_last(qr)
    kr = hadamard_transform_last(kr)
    kq_t, kp_t = KV.asym_quant_pack_head(kr)
    vq_t, vp_t = KV.asym_quant_pack_head(v)
    k_self = KV.unpack_dequant_head(kq_t, kp_t)
    v_self = KV.unpack_dequant_head(vq_t, vp_t)

    np.testing.assert_allclose(np.asarray(qh, np.float32),
                               np.asarray(qr, np.float32),
                               rtol=2e-2, atol=2e-2)
    # dequantized self values: the dense-MXU hadamard differs from the
    # butterfly by sub-ulp f32 summation order, which can flip a code
    # sitting exactly on a rounding boundary — every element must agree
    # within ONE quantization step of its head's scale
    kscale = np.asarray(nkp[..., 0:1, 0])         # (B, Hkv, 1)
    dk = np.abs(np.asarray(ks) - np.asarray(k_self))
    assert (dk <= 1.01 * kscale + 1e-6).all(), dk.max()
    np.testing.assert_allclose(np.asarray(vs), np.asarray(v_self),
                               rtol=0.05, atol=0.05)
    # v is untouched by rope/hadamard -> codes must match EXACTLY
    np.testing.assert_array_equal(np.asarray(nvq[..., 0]),
                                  np.asarray(vq_t))
    np.testing.assert_allclose(np.asarray(nvp[..., 0]), np.asarray(vp_t),
                               rtol=1e-6, atol=1e-6)
    # every lane of the broadcast outputs carries the same value
    np.testing.assert_array_equal(np.asarray(nkq[..., 0]),
                                  np.asarray(nkq[..., 127]))
    # round-trip: dequantizing the packed outputs reproduces ks/vs exactly
    deq = KV.unpack_dequant_head(nkq[..., 0], nkp[..., 0])
    np.testing.assert_allclose(np.asarray(deq), np.asarray(ks),
                               rtol=1e-5, atol=1e-5)


def test_fused_head_mix_matches_outer_mixer():
    """mix_heads=True folds the o_proj head-mixing Hadamard into the
    attention finalize as the EXACT butterfly DAG of
    head_mixing_hadamard — the two must agree to bf16 rounding.  (The
    fused mix is currently off in the serving callers — measured slower
    on v5e, the in-kernel transposes dominate at decode shapes — but the
    capability stays correct.)"""
    import numpy as np
    from rsq_tpu.core.hadamard import head_mixing_hadamard

    B, Hq, Hkv, D, S = 2, 4, 2, 16, 64
    rng = np.random.default_rng(0)
    kq = jnp.asarray(rng.integers(0, 255, (1, B, Hkv, D // 2, S)),
                     jnp.uint8)
    kp = jnp.asarray(rng.uniform(0.01, 0.1, (1, B, Hkv, 2, S)),
                     jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    ks = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    nkq = jnp.zeros((B, Hkv, D // 2, 1), jnp.uint8)
    nkp = jnp.ones((B, Hkv, 2, 1), jnp.float32)
    lengths = jnp.asarray([30, 50], jnp.int32)

    out0, *_ = KV.int4_decode_attention_self_append(
        q, kq, kp, kq, kp, 0, lengths, ks, ks, nkq, nkp, nkq, nkp,
        mix_heads=False, interpret=True)
    ref = head_mixing_hadamard(out0.reshape(B, Hq * D), head_dim=D)
    out1, *_ = KV.int4_decode_attention_self_append(
        q, kq, kp, kq, kp, 0, lengths, ks, ks, nkq, nkp, nkq, nkp,
        mix_heads=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out1.reshape(B, Hq * D), np.float32),
        np.asarray(ref, np.float32), rtol=1e-2, atol=1e-2)


def test_contiguous_int8_qk_close_to_default():
    """int8_qk on the contiguous stacked kernel: q's int8 round-trip is
    the same error order as the default path's bf16 cast of q, so the
    attention outputs must track to ~1e-2 on O(1) values with the cache
    and (m, l) semantics unchanged."""
    rng = np.random.default_rng(29)
    B, Hkv, G, D, S, L = 2, 2, 4, 128, 256, 1
    Hq = Hkv * G
    kq = jnp.asarray(rng.integers(0, 256, (L, B, Hkv, D // 2, S),
                                  dtype=np.uint8))
    kp = jnp.asarray(np.stack(
        [rng.uniform(0.05, 0.2, (L, B, Hkv, S)),
         rng.uniform(0.5, 2.0, (L, B, Hkv, S))], axis=3).astype(np.float32))
    vq = jnp.asarray(rng.integers(0, 256, (L, B, Hkv, D // 2, S),
                                  dtype=np.uint8))
    vp = jnp.asarray(np.stack(
        [rng.uniform(0.05, 0.2, (L, B, Hkv, S)),
         rng.uniform(0.5, 2.0, (L, B, Hkv, S))], axis=3).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    lengths = jnp.asarray([200, 37], jnp.int32)

    o_bf, m0, l0 = KV.int4_decode_attention_stacked(q, kq, kp, vq, vp, 0,
                                                    lengths)
    o_i8, m1, l1 = KV.int4_decode_attention_stacked(q, kq, kp, vq, vp, 0,
                                                    lengths, int8_qk=True)
    a, b = np.asarray(o_bf, np.float32), np.asarray(o_i8, np.float32)
    np.testing.assert_allclose(a, b, atol=3e-2)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999
