"""Property tests for quantizer primitives (the test pyramid the reference
lacks — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.core import quant as Q


def test_minq_maxq():
    assert Q.minq_maxq(4, True) == (-8, 7)
    assert Q.minq_maxq(4, False) == (0, 15)
    assert Q.minq_maxq(8, True) == (-128, 127)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(16, 64)).astype(np.int8)
    packed = Q.pack_int4(jnp.asarray(q))
    assert packed.shape == (16, 32)
    assert packed.dtype == jnp.uint8
    out = Q.unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(out), q)


def test_sym_quant_dequant_exact_on_grid():
    # values exactly on the grid survive a round trip
    scale = jnp.float32(0.5)
    grid = jnp.arange(-8, 8, dtype=jnp.float32) * scale
    out = Q.sym_quant_dequant(grid, scale, 7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(grid))


def test_sym_quant_clip_range():
    scale = jnp.float32(1.0)
    q = Q.sym_quant(jnp.array([100.0, -100.0]), scale, 7)
    np.testing.assert_array_equal(np.asarray(q), [7.0, -8.0])


def test_act_quant_per_token_error_bound():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 32, 128)).astype(np.float32))
    cfg = Q.ActQuantConfig(bits=8, sym=True)
    y = Q.act_fake_quant(x, cfg)
    # max error per token is half an LSB of that token's scale
    scale, _ = Q.act_quant_params(x, cfg)
    err = jnp.abs(y - x)
    assert float(jnp.max(err / scale)) <= 0.5 + 1e-3


def test_act_quant_asym_better_on_shifted_data():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32) + 5.0)
    sym = Q.act_fake_quant(x, Q.ActQuantConfig(bits=4, sym=True))
    asym = Q.act_fake_quant(x, Q.ActQuantConfig(bits=4, sym=False))
    assert float(jnp.mean((asym - x) ** 2)) < float(jnp.mean((sym - x) ** 2))


def test_act_quant_groupwise_shapes():
    x = jnp.ones((2, 8, 128))
    y = Q.act_fake_quant(x, Q.ActQuantConfig(bits=4, groupsize=32))
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_act_quant_16bit_identity():
    x = jnp.ones((3, 5))
    assert Q.act_fake_quant(x, Q.ActQuantConfig(bits=16)) is x


def test_weight_quant_params_zero_row_safe():
    W = jnp.zeros((4, 16))
    cfg = Q.WeightQuantConfig(bits=4, sym=True)
    scale, zero = Q.weight_quant_params(W, cfg)
    assert np.all(np.isfinite(np.asarray(scale)))
    out = Q.weight_fake_quant(W, scale, zero, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.zeros((4, 16)))


def test_weight_mse_clip_never_worse():
    rng = np.random.default_rng(3)
    # heavy-tailed rows: clipping should help (and must never hurt by design)
    W = jnp.asarray((rng.standard_normal((16, 256)) ** 3).astype(np.float32))
    base_cfg = Q.WeightQuantConfig(bits=4, sym=True, mse=False)
    mse_cfg = Q.WeightQuantConfig(bits=4, sym=True, mse=True)
    s0, z0 = Q.weight_quant_params(W, base_cfg)
    s1, z1 = Q.weight_quant_params(W, mse_cfg)
    e0 = float(jnp.sum(jnp.abs(Q.weight_fake_quant(W, s0, z0, base_cfg) - W) ** 2.4))
    e1 = float(jnp.sum(jnp.abs(Q.weight_fake_quant(W, s1, z1, mse_cfg) - W) ** 2.4))
    assert e1 <= e0 + 1e-4


@pytest.mark.parametrize("sym", [True, False])
def test_weight_store_matches_fake_quant(sym):
    rng = np.random.default_rng(4)
    W = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    cfg = Q.WeightQuantConfig(bits=4, sym=sym)
    scale, zero = Q.weight_quant_params(W, cfg)
    codes = Q.weight_quantize_store(W, scale, zero, cfg)
    if sym:
        deq = Q.sym_dequant(codes.astype(jnp.float32), scale)
    else:
        deq = Q.asym_dequant(codes.astype(jnp.float32), scale, zero)
    fq = Q.weight_fake_quant(W, scale, zero, cfg)
    np.testing.assert_allclose(np.asarray(deq), np.asarray(fq), rtol=1e-6, atol=1e-6)


def test_nf_codebook_and_quant():
    from rsq_tpu.core import nf
    v = nf.nf_codebook(4)
    assert len(v) == 16
    assert v[0] < 0 < v[-1]
    assert abs(v[2 ** 3 - 1]) < 1e-9  # zero is on the grid
    # round trip: codebook values map to themselves at scale 1
    x = jnp.asarray(v, jnp.float32)
    out = nf.nf_quant_dequant(x, 4, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), v, atol=1e-5)


def test_nf_weight_quant_beats_uniform_on_gaussian():
    from rsq_tpu.core import nf
    rng = np.random.default_rng(11)
    W = jnp.asarray(rng.standard_normal((8, 512)).astype(np.float32))
    cfg_nf = Q.WeightQuantConfig(bits=4, nf=True)
    cfg_u = Q.WeightQuantConfig(bits=4, sym=True)
    s_nf, z_nf = Q.weight_quant_params(W, cfg_nf)
    s_u, z_u = Q.weight_quant_params(W, cfg_u)
    e_nf = float(jnp.mean((Q.weight_fake_quant(W, s_nf, z_nf, cfg_nf) - W) ** 2))
    e_u = float(jnp.mean((Q.weight_fake_quant(W, s_u, z_u, cfg_u) - W) ** 2))
    assert e_nf < e_u  # NF4 is optimized for Gaussian weights
