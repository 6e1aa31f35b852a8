"""Pipeline parallelism: GPipe SPMD schedule on the 8-CPU mesh vs the
single-device forward oracle (parallel/pp.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import FP16, QuantPolicy
from rsq_tpu.parallel import pp


@pytest.fixture(scope="module")
def mesh():
    return pp.make_pp_mesh(8)


def test_pp_forward_matches_oracle(mesh):
    cfg = ModelConfig.tiny(num_layers=8)
    params = M.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (4, 16)))
    want = np.asarray(M.forward(params, ids, cfg, FP16))

    stacked = pp.stack_layers(params["layers"])
    stacked = pp.shard_stacked_layers(stacked, mesh)
    fwd = pp.make_pp_forward(cfg, FP16, mesh, n_micro=4)
    got = np.asarray(fwd(params, stacked, ids))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pp_two_layers_per_stage_quantized_policy(mesh):
    """16 layers over 8 stages (2 layers/stage) with an act-quant policy."""
    from rsq_tpu.core.quant import ActQuantConfig

    cfg = ModelConfig.tiny(num_layers=16)
    params = M.init_params(cfg, jax.random.PRNGKey(1), scale=0.05)
    pol = QuantPolicy(a=ActQuantConfig(bits=8))
    ids = jnp.asarray(np.random.default_rng(1).integers(
        0, cfg.vocab_size, (8, 12)))
    want = np.asarray(M.forward(params, ids, cfg, pol))

    stacked = pp.shard_stacked_layers(pp.stack_layers(params["layers"]), mesh)
    fwd = pp.make_pp_forward(cfg, pol, mesh, n_micro=2)
    got = np.asarray(fwd(params, stacked, ids))
    # act-quant rounds ulp-level scan-vs-unrolled reassociation diffs to
    # different 8-bit buckets on a few boundary values; the resulting
    # logit deviation is bounded by one quant step
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=2e-2)
    assert (got.argmax(-1) == want.argmax(-1)).mean() > 0.99


def test_pp_fused_norm_layers_stack(mesh):
    """Fused (None-norm) layers stack and pipeline correctly."""
    from rsq_tpu.quantize import rotation

    cfg = ModelConfig.tiny(num_layers=8)
    params = M.init_params(cfg, jax.random.PRNGKey(2), scale=0.05)
    fused = rotation.fuse_norms(params, cfg)
    pol = QuantPolicy(norms_fused=True)
    ids = jnp.asarray(np.random.default_rng(2).integers(
        0, cfg.vocab_size, (4, 8)))
    want = np.asarray(M.forward(fused, ids, cfg, pol))

    stacked = pp.shard_stacked_layers(pp.stack_layers(fused["layers"]), mesh)
    fwd = pp.make_pp_forward(cfg, pol, mesh, n_micro=4)
    got = np.asarray(fwd(fused, stacked, ids))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ppl_pp_matches_fullmodel(mesh):
    from rsq_tpu.eval.ppl import ppl_fullmodel, ppl_pp
    from rsq_tpu.quantize import data as D

    cfg = ModelConfig.tiny(num_layers=8)
    params = M.init_params(cfg, jax.random.PRNGKey(3), scale=0.05)
    stream = D.get_loaders("synthetic", eval_mode=True,
                           vocab_size=cfg.vocab_size)[:2048]
    want = ppl_fullmodel(params, cfg, FP16, stream, val_seqlen=16, bsz=8)
    got = ppl_pp(params, cfg, FP16, stream, val_seqlen=16, mesh=mesh, bsz=8)
    assert abs(got - want) / want < 1e-3


@pytest.mark.parametrize("n_micro", [8, 16])
def test_pp_sharded_activation_schedule_matches_oracle(mesh, n_micro):
    """pp | n_micro engages the activation-sharded schedule (cyclic
    microbatch sharding + rotating queues, no replicated xs / psum).  Must
    match the single-device forward exactly like the legacy path."""
    cfg = ModelConfig.tiny(num_layers=8)
    params = M.init_params(cfg, jax.random.PRNGKey(3), scale=0.05)
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab_size, (n_micro, 16)))  # 1 sequence per microbatch
    want = np.asarray(M.forward(params, ids, cfg, FP16))

    stacked = pp.stack_layers(params["layers"])
    stacked = pp.shard_stacked_layers(stacked, mesh)
    fwd = pp.make_pp_forward(cfg, FP16, mesh, n_micro=n_micro)
    got = np.asarray(fwd(params, stacked, ids))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
