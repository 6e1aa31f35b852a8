"""Utils tests: sharded eval, layer IO capture, results aggregation,
roofline."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import FP16
from rsq_tpu.parallel.eval_sharding import distribute_model, sharded_ppl
from rsq_tpu.parallel.tp import make_mesh
from rsq_tpu.quantize import data as D
from rsq_tpu.eval.ppl import ppl_fullmodel
from rsq_tpu.utils import capture as C
from rsq_tpu.utils import results as R
from rsq_tpu.utils.profiling import roofline_seconds, efficiency


def test_sharded_ppl_matches_single_device():
    cfg = ModelConfig.tiny(num_layers=2, hidden_size=128,
                           intermediate_size=256, num_attention_heads=8,
                           num_key_value_heads=4)
    params = M.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    stream = D.get_loaders("synthetic", eval_mode=True,
                           vocab_size=cfg.vocab_size)[:2048]
    base = ppl_fullmodel(params, cfg, FP16, stream, val_seqlen=32, bsz=4)
    mesh = make_mesh(8, dp=2)
    got = sharded_ppl(params, cfg, FP16, stream, 32, mesh, bsz=4)
    assert got == pytest.approx(base, rel=1e-3)


def test_capture_layer_io_and_stats():
    cfg = ModelConfig.tiny(num_layers=1)
    params = M.init_params(cfg, jax.random.PRNGKey(1), scale=0.05)
    xs = np.asarray(jax.random.normal(jax.random.PRNGKey(2),
                                      (2, 8, cfg.hidden_size)))
    cap = C.capture_layer_io(params["layers"][0], xs, cfg, FP16)
    assert set(cap) == {"qkv", "o", "up_gate", "down", "output"}
    assert cap["qkv"].shape == (2, 8, cfg.hidden_size)
    assert cap["down"].shape == (2, 8, cfg.intermediate_size)
    stats = C.activation_stats(cap)
    assert all(s["max_over_rms"] > 0 for s in stats.values())


def test_results_aggregation(tmp_path):
    d = tmp_path / "exp"
    d.mkdir()
    for seed, ppl in [(0, 10.0), (1, 12.0), (2, 11.0)]:
        (d / f"s{seed}.jsonl").write_text(
            json.dumps({"config": "w4", "seed": seed, "ppl": ppl}) + "\n")
    rows = R.collect_results(str(tmp_path))
    assert len(rows) == 3
    table = R.tabulate(rows, ("config",), ("ppl",))
    assert "w4" in table and "11" in table


def test_roofline():
    # 8B int4 weights at decode: ~4GB per token-step -> ~5ms at 819GB/s
    t = roofline_seconds(hbm_bytes=4e9)
    assert 0.004 < t < 0.006
    assert efficiency(2 * t, hbm_bytes=4e9) == pytest.approx(0.5)
