"""Sequence/context parallelism: ring flash attention over the 8-CPU mesh.

Validates the shard_map ring (parallel/sp.py) token-for-token against the
single-device oracles: dense causal attention and llama.forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import FP16, QuantPolicy
from rsq_tpu.parallel import sp


@pytest.fixture(scope="module")
def mesh():
    return sp.make_sp_mesh(8)


def _ring_vs_dense(mesh, b, s, h, hkv, d, seed):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)

    want = M.attention_dense(
        q, M.repeat_kv(k, h // hkv), M.repeat_kv(v, h // hkv),
        M.causal_mask(s))

    ringed = jax.jit(jax.shard_map(
        lambda a, b_, c: sp.ring_attention(a, b_, c, "sp"), mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp")))
    got = ringed(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_matches_dense_mha(mesh):
    _ring_vs_dense(mesh, b=2, s=64, h=4, hkv=4, d=16, seed=0)


def test_ring_attention_matches_dense_gqa(mesh):
    # GQA: kv blocks ring unrepeated (hkv=2 for 4 query heads)
    _ring_vs_dense(mesh, b=2, s=32, h=4, hkv=2, d=8, seed=1)


def test_sp_prefill_matches_forward(mesh):
    cfg = ModelConfig.tiny()
    params = M.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    ids = jnp.asarray(np.random.default_rng(2).integers(
        0, cfg.vocab_size, (2, 32)))
    want = np.asarray(M.forward(params, ids, cfg, FP16))
    prefill = sp.make_sp_prefill(cfg, FP16, mesh)
    got = np.asarray(prefill(params, ids))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sp_prefill_quantized_policy(mesh):
    """Rotated + k/v-quantized policy through the ring matches the
    single-device quantized forward bit-for-bit in semantics."""
    from rsq_tpu.core.quant import ActQuantConfig
    from rsq_tpu.models.policy import KVQuantConfig
    from rsq_tpu.quantize import rotation

    cfg = ModelConfig.tiny()
    params = M.init_params(cfg, jax.random.PRNGKey(1), scale=0.05)
    rotated, _ = rotation.rotate_model(params, cfg, mode="hadamard", seed=0)
    pol = QuantPolicy(
        norms_fused=True, online_had_down=True, online_had_o=True,
        fp32_had=True,
        a=ActQuantConfig(bits=8),
        k=KVQuantConfig(bits=8), v=KVQuantConfig(bits=8))
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab_size, (2, 16)))
    want = np.asarray(M.forward(rotated, ids, cfg, pol))
    prefill = sp.make_sp_prefill(cfg, pol, mesh)
    got = np.asarray(prefill(rotated, ids))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
