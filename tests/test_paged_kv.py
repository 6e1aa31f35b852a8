"""Paged INT4 KV decode: kernel vs oracle, page writes, prefix sharing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.kernels import kv_cache as KVK
from rsq_tpu.kernels import paged_kv as PKV


def _random_pool(rng, P, H, D, page):
    kq = jnp.asarray(rng.integers(0, 256, size=(P, H, D // 2, page),
                                  dtype=np.uint8))
    kp = jnp.asarray(
        np.stack([rng.uniform(0.01, 0.2, size=(P, H, page)),
                  rng.uniform(-0.5, 0.5, size=(P, H, page))],
                 axis=2).astype(np.float32))
    vq = jnp.asarray(rng.integers(0, 256, size=(P, H, D // 2, page),
                                  dtype=np.uint8))
    vp = jnp.asarray(
        np.stack([rng.uniform(0.01, 0.2, size=(P, H, page)),
                  rng.uniform(-0.5, 0.5, size=(P, H, page))],
                 axis=2).astype(np.float32))
    return kq, kp, vq, vp


@pytest.mark.parametrize("G", [1, 4])
def test_paged_decode_matches_oracle(G):
    rng = np.random.default_rng(0)
    B, Hkv, D, page, P, NP = 3, 2, 64, 128, 16, 4
    Hq = Hkv * G
    kq, kp, vq, vp = _random_pool(rng, P, Hkv, D, page)
    # shuffled, non-contiguous page assignment; slots 0 and 1 SHARE their
    # first page (prefix sharing)
    ptab = np.array([[7, 3, 11, 0],
                     [7, 5, 0, 0],
                     [2, 9, 14, 1]], dtype=np.int32)
    lengths = np.array([page * 2 + 17, page + 3, page * 4], dtype=np.int32)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))

    out = PKV.int4_paged_decode_attention(
        q, kq, kp, vq, vp, jnp.asarray(ptab), jnp.asarray(lengths))
    ref = PKV.int4_paged_decode_attention_reference(
        q, kq, kp, vq, vp, jnp.asarray(ptab), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_paged_matches_contiguous_kernel():
    """Identity page table == the contiguous-slot kernel."""
    rng = np.random.default_rng(1)
    B, Hkv, D, page, NP = 2, 2, 64, 128, 3
    S = NP * page
    P = B * NP
    kq, kp, vq, vp = _random_pool(rng, P, Hkv, D, page)
    ptab = jnp.arange(P, dtype=jnp.int32).reshape(B, NP)
    lengths = jnp.asarray([S - 40, 2 * page], dtype=jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, Hkv, D)).astype(np.float32))

    paged = PKV.int4_paged_decode_attention(q, kq, kp, vq, vp, ptab, lengths)

    def contig(pool):  # (B*NP, H, x, page) -> (B, H, x, S)
        g = pool.reshape(B, NP, Hkv, pool.shape[2], page)
        return jnp.moveaxis(g, 1, -2).reshape(B, Hkv, pool.shape[2], S)

    # chunk sizes differ (page vs min(512, S)) so the online-softmax
    # accumulation order differs -> small fp32 drift, not a layout bug
    cont = KVK.int4_decode_attention(
        q, contig(kq), contig(kp), contig(vq), contig(vp), lengths)
    np.testing.assert_allclose(np.asarray(paged), np.asarray(cont),
                               rtol=2e-3, atol=2e-3)


def test_write_prompt_and_append_roundtrip():
    rng = np.random.default_rng(2)
    Hkv, D, page, P = 2, 64, 128, 8
    pool = PKV.init_pool(1, P, Hkv, D, page)
    psl = {k: v[0] for k, v in pool.items()}

    s_prompt = 2 * page
    k = jnp.asarray(rng.standard_normal((1, Hkv, s_prompt, D))
                    .astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, Hkv, s_prompt, D))
                    .astype(np.float32))
    kq, kp = PKV.quantize_prompt(k, hadamard=False)
    vq, vp = PKV.quantize_prompt(v, hadamard=False)
    page_ids = jnp.asarray([5, 2], dtype=jnp.int32)  # non-contiguous
    psl = PKV.write_prompt_pages(psl, page_ids, kq[0], kp[0], vq[0], vp[0])

    # append one more token at position s_prompt (needs a third page)
    ptab = jnp.asarray([[5, 2, 7, 0]], dtype=jnp.int32)
    knew = jnp.asarray(rng.standard_normal((1, Hkv, 1, D)).astype(np.float32))
    vnew = jnp.asarray(rng.standard_normal((1, Hkv, 1, D)).astype(np.float32))
    nkq, nkp = PKV.quantize_prompt(knew, hadamard=False)
    nvq, nvp = PKV.quantize_prompt(vnew, hadamard=False)
    psl = PKV.append_token_pages(psl, ptab,
                                 jnp.asarray([s_prompt], jnp.int32),
                                 nkq, nkp, nvq, nvp)

    kg, vg = PKV.gather_prefix(psl, ptab[0, :3])
    kfull = jnp.concatenate([k[0], PKV.unpack_dequant_head(
        *map(lambda t: jnp.swapaxes(t[0], -1, -2), (nkq, nkp)))], axis=1)
    # cached K/V round-trips within int4 quantization error
    err = np.abs(np.asarray(kg[:, :s_prompt + 1]) - np.asarray(kfull))
    scale = np.asarray(kp[0, :, 0, :]).max()
    assert err.max() <= scale * 1.01 + 1e-5

    # decode over the written pages == oracle
    q = jnp.asarray(rng.standard_normal((1, Hkv, D)).astype(np.float32))
    lengths = jnp.asarray([s_prompt + 1], jnp.int32)
    pools = {k: v[None] for k, v in psl.items()}  # wrap P axis? no—
    out = PKV.int4_paged_decode_attention(
        q, psl["kq"], psl["kp"], psl["vq"], psl["vp"], ptab, lengths)
    ref = PKV.int4_paged_decode_attention_reference(
        q, psl["kq"], psl["kp"], psl["vq"], psl["vp"], ptab, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    del pools


def test_shared_prefix_page_gives_identical_attention():
    """Two slots sharing their prefix page attend identically to it."""
    rng = np.random.default_rng(3)
    Hkv, D, page, P = 2, 64, 128, 6
    kq, kp, vq, vp = _random_pool(rng, P, Hkv, D, page)
    ptab = jnp.asarray([[4, 1], [4, 2]], dtype=jnp.int32)
    lengths = jnp.asarray([page, page], jnp.int32)  # only the shared page
    q1 = rng.standard_normal((1, Hkv, D)).astype(np.float32)
    q = jnp.asarray(np.concatenate([q1, q1], axis=0))
    out = PKV.int4_paged_decode_attention(q, kq, kp, vq, vp, ptab, lengths)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]),
                               rtol=1e-6, atol=1e-6)


def test_paged_stacked_matches_unstacked():
    """int4_paged_decode_attention_stacked(layer=i) == slicing the pool."""
    rng = np.random.default_rng(7)
    L, Hkv, D, page, P, B = 3, 2, 64, 128, 5, 2
    pools = [_random_pool(rng, P, Hkv, D, page) for _ in range(L)]
    kq = jnp.stack([p[0] for p in pools])
    kp = jnp.stack([p[1] for p in pools])
    vq = jnp.stack([p[2] for p in pools])
    vp = jnp.stack([p[3] for p in pools])
    ptab = jnp.asarray([[0, 2], [3, 1]], dtype=jnp.int32)
    lengths = jnp.asarray([page + 7, 2 * page], jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, Hkv, D)).astype(np.float32))
    for i in range(L):
        out = PKV.int4_paged_decode_attention_stacked(
            q, kq, kp, vq, vp, i, ptab, lengths)
        want = PKV.int4_paged_decode_attention(
            q, kq[i], kp[i], vq[i], vp[i], ptab, lengths)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_paged_stacked_self_fold_matches_append_then_attend():
    """Self-folding paged decode (pool NOT yet holding the new token) must
    equal appending the quantized token to the pool first, then attending
    over lengths+1 — the contract the fast decode path relies on."""
    rng = np.random.default_rng(11)
    L, Hkv, D, page, P, B = 2, 2, 64, 128, 8, 3
    pools = [_random_pool(rng, P, Hkv, D, page) for _ in range(L)]
    kq = jnp.stack([p[0] for p in pools])
    kp = jnp.stack([p[1] for p in pools])
    vq = jnp.stack([p[2] for p in pools])
    vp = jnp.stack([p[3] for p in pools])
    ptab = jnp.asarray([[0, 2, 5], [3, 1, 6], [4, 7, 0]], dtype=jnp.int32)
    lengths = jnp.asarray([page + 7, 2 * page, 0], jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, Hkv, D)).astype(np.float32))

    knew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)).astype(np.float32))
    vnew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)).astype(np.float32))
    nkq, nkp = KVK.asym_quant_pack_head(knew)
    nvq, nvp = KVK.asym_quant_pack_head(vnew)
    k_self = KVK.unpack_dequant_head(nkq, nkp)[:, :, 0]
    v_self = KVK.unpack_dequant_head(nvq, nvp)[:, :, 0]

    for i in range(L):
        got = PKV.int4_paged_decode_attention_stacked_self(
            q, kq, kp, vq, vp, i, ptab, lengths, k_self, v_self)
        # oracle: append to the pool, then attend at lengths+1
        kq2, kp2, vq2, vp2 = PKV.paged_append_pool(
            kq, kp, vq, vp, i, ptab, lengths,
            *KVK.to_lane_major(nkq, nkp), *KVK.to_lane_major(nvq, nvp))
        want = PKV.int4_paged_decode_attention_reference(
            q, kq2[i], kp2[i], vq2[i], vp2[i], ptab, lengths + 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)


def test_paged_append_pool_matches_dus_path():
    """Aliased Pallas pool append == the jnp dynamic_update_slice path."""
    rng = np.random.default_rng(12)
    L, Hkv, D, page, P, B = 2, 2, 64, 256, 6, 2
    pools = [_random_pool(rng, P, Hkv, D, page) for _ in range(L)]
    pool = {
        "kq": jnp.stack([p[0] for p in pools]),
        "kp": jnp.stack([p[1] for p in pools]),
        "vq": jnp.stack([p[2] for p in pools]),
        "vp": jnp.stack([p[3] for p in pools]),
    }
    ptab = jnp.asarray([[1, 4, 0], [5, 2, 3]], dtype=jnp.int32)
    # positions exercising both lane blocks of the 256-token page and a
    # page boundary crossing
    positions = jnp.asarray([page + 131, 250], jnp.int32)
    knew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)).astype(np.float32))
    vnew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)).astype(np.float32))
    nkq, nkp = KVK.to_lane_major(*KVK.asym_quant_pack_head(knew))
    nvq, nvp = KVK.to_lane_major(*KVK.asym_quant_pack_head(vnew))

    for layer in range(L):
        got = PKV.paged_append_pool(pool["kq"], pool["kp"], pool["vq"],
                                    pool["vp"], layer, ptab, positions,
                                    nkq, nkp, nvq, nvp)
        from rsq_tpu.serving.paged import _pool_append_token
        want = _pool_append_token(dict(pool), layer, ptab, positions,
                                  nkq, nkp, nvq, nvp)
        for g, name in zip(got, ("kq", "kp", "vq", "vp")):
            np.testing.assert_array_equal(np.asarray(g),
                                          np.asarray(want[name]))


def test_paged_append_pool_small_pages_cross_boundary():
    """Regression: with page < 128 the append window is the page itself and
    the in-window column is pos %% page — the fixed %%128 column of the
    contiguous append kernel silently dropped any append past the first
    page (positions 8..., page_size 8), which surfaced as nondeterministic
    paged-TP trajectories."""
    rng = np.random.default_rng(13)
    L, Hkv, D, page, P, B = 1, 2, 64, 8, 6, 2
    pools = [_random_pool(rng, P, Hkv, D, page) for _ in range(L)]
    pool = {
        "kq": jnp.stack([p[0] for p in pools]),
        "kp": jnp.stack([p[1] for p in pools]),
        "vq": jnp.stack([p[2] for p in pools]),
        "vp": jnp.stack([p[3] for p in pools]),
    }
    ptab = jnp.asarray([[1, 4, 2], [5, 2, 3]], dtype=jnp.int32)
    positions = jnp.asarray([9, 17], jnp.int32)  # pages 1 and 2, cols 1, 1
    knew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)).astype(np.float32))
    vnew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)).astype(np.float32))
    nkq, nkp = KVK.to_lane_major(*KVK.asym_quant_pack_head(knew))
    nvq, nvp = KVK.to_lane_major(*KVK.asym_quant_pack_head(vnew))

    got = PKV.paged_append_pool(pool["kq"], pool["kp"], pool["vq"],
                                pool["vp"], 0, ptab, positions,
                                nkq, nkp, nvq, nvp)
    from rsq_tpu.serving.paged import _pool_append_token
    want = _pool_append_token(dict(pool), 0, ptab, positions,
                              nkq, nkp, nvq, nvp)
    for g, name in zip(got, ("kq", "kp", "vq", "vp")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(want[name]))


@pytest.mark.parametrize("flat", [False, True])
def test_fused_self_append_matches_separate_kernels(flat):
    """int4_paged_decode_attention_self_append == stacked_self attention
    followed by paged_append_pool, including the page-boundary (fresh
    page) case — for both the (B, npg)-grid kernel and the
    single-grid-step flat kernel (manual write-back DMAs)."""
    rng = np.random.default_rng(17)
    L, Hkv, D, page, P, B = 2, 2, 64, 128, 10, 3
    pools = [_random_pool(rng, P, Hkv, D, page) for _ in range(L)]
    kq = jnp.stack([p[0] for p in pools])
    kp = jnp.stack([p[1] for p in pools])
    vq = jnp.stack([p[2] for p in pools])
    vp = jnp.stack([p[3] for p in pools])
    ptab = jnp.asarray([[0, 2, 5], [3, 1, 6], [4, 7, 8]], dtype=jnp.int32)
    # mid-page, page-boundary (fresh page), empty-cache cases
    lengths = jnp.asarray([page + 7, page, 0], jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, Hkv, D)).astype(np.float32))

    knew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)).astype(np.float32))
    vnew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)).astype(np.float32))
    nkq_t, nkp_t = KVK.asym_quant_pack_head(knew)
    nvq_t, nvp_t = KVK.asym_quant_pack_head(vnew)
    k_self = KVK.unpack_dequant_head(nkq_t, nkp_t)[:, :, 0]
    v_self = KVK.unpack_dequant_head(nvq_t, nvp_t)[:, :, 0]
    nkq, nkp = KVK.to_lane_major(nkq_t, nkp_t)
    nvq, nvp = KVK.to_lane_major(nvq_t, nvp_t)

    for i in range(L):
        out_f, kq2, kp2, vq2, vp2 = \
            PKV.int4_paged_decode_attention_self_append(
                q, kq, kp, vq, vp, i, ptab, lengths, k_self, v_self,
                nkq, nkp, nvq, nvp, flat=flat)
        out_s = PKV.int4_paged_decode_attention_stacked_self(
            q, kq, kp, vq, vp, i, ptab, lengths, k_self, v_self)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                                   rtol=1e-5, atol=1e-5)
        kq3, kp3, vq3, vp3 = PKV.paged_append_pool(
            kq, kp, vq, vp, i, ptab, lengths, nkq, nkp, nvq, nvp)
        # the written lane must match exactly; lanes of a FRESH page other
        # than the written one may carry stale content (masked by lengths),
        # so compare only the pages the separate-append oracle touched at
        # the written positions and all non-fresh content
        for got, want, name in ((kq2, kq3, "kq"), (kp2, kp3, "kp"),
                                (vq2, vq3, "vq"), (vp2, vp3, "vp")):
            g, w = np.asarray(got), np.asarray(want)
            for b in range(B):
                pos = int(lengths[b])
                pid = int(ptab[b, pos // page])
                off = pos % page
                np.testing.assert_array_equal(
                    g[i, pid, :, :, off], w[i, pid, :, :, off],
                    err_msg=f"{name} slot {b} written lane")
                if off != 0:
                    # same-page case: the rest of the page preserved
                    np.testing.assert_array_equal(
                        g[i, pid, :, :, :off], w[i, pid, :, :, :off])


@pytest.mark.parametrize("flat", [False, True])
def test_fused_self_append_int8_qk_close_to_default(flat):
    """attn int8 QK (q -> symmetric int8 per row, unsigned nibbles on the
    int8 MXU) stays within bf16-q-rounding distance of the default path:
    both round q at ~1/256 relative, so outputs must agree to ~1e-2 on
    O(1) dequantized values (measured 9e-3 max at these shapes)."""
    rng = np.random.default_rng(23)
    L, Hkv, D, page, P, B = 1, 2, 64, 128, 8, 3
    pools = [_random_pool(rng, P, Hkv, D, page)]
    kq = jnp.stack([p[0] for p in pools])
    kp = jnp.stack([p[1] for p in pools])
    vq = jnp.stack([p[2] for p in pools])
    vp = jnp.stack([p[3] for p in pools])
    ptab = jnp.asarray([[0, 2, 5], [3, 1, 6], [4, 7, 2]], dtype=jnp.int32)
    lengths = jnp.asarray([page + 7, page, 0], jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, Hkv * 4, D)).astype(np.float32))
    knew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)).astype(np.float32))
    vnew = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)).astype(np.float32))
    nkq_t, nkp_t = KVK.asym_quant_pack_head(knew)
    nvq_t, nvp_t = KVK.asym_quant_pack_head(vnew)
    k_self = KVK.unpack_dequant_head(nkq_t, nkp_t)[:, :, 0]
    v_self = KVK.unpack_dequant_head(nvq_t, nvp_t)[:, :, 0]
    nkq, nkp = KVK.to_lane_major(nkq_t, nkp_t)
    nvq, nvp = KVK.to_lane_major(nvq_t, nvp_t)

    out_bf, *pools_bf = PKV.int4_paged_decode_attention_self_append(
        q, kq, kp, vq, vp, 0, ptab, lengths, k_self, v_self,
        nkq, nkp, nvq, nvp, flat=flat)
    out_i8, *pools_i8 = PKV.int4_paged_decode_attention_self_append(
        q, kq, kp, vq, vp, 0, ptab, lengths, k_self, v_self,
        nkq, nkp, nvq, nvp, flat=flat, int8_qk=True)
    a, b = np.asarray(out_bf, np.float32), np.asarray(out_i8, np.float32)
    np.testing.assert_allclose(a, b, atol=3e-2)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999
    # the append (cache contents) must be IDENTICAL — int8_qk only touches
    # the QK contraction, never what is written to the pool
    for g, w in zip(pools_bf, pools_i8):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
