"""Continuous-batching engine + native scheduler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import FP16
from rsq_tpu.serving import model as S
from rsq_tpu.serving.engine import ServingEngine, decode_step_varlen
from rsq_tpu.serving.native import maybe_scheduler
from rsq_tpu.serving.params import to_serving_params


@pytest.fixture(scope="module")
def tiny_serving():
    cfg = ModelConfig.tiny(num_layers=2, intermediate_size=128)
    params = M.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    sparams = to_serving_params(params, {}, cfg)
    sc = S.ServingConfig(model=cfg, a4=False, kv_int4=True, kv_hadamard=True,
                         online_had=False, max_seq=48)
    return cfg, params, sparams, sc


def test_native_scheduler_build_and_accounting():
    sched = maybe_scheduler(num_slots=4, max_seq=1024, page_size=256)
    assert sched is not None, "g++ is available in this image; build must work"
    assert sched.free_slots == 4
    total_pages = 4 * (1024 // 256)
    assert sched.pages_free == total_pages

    sched.enqueue(1, prompt_len=100, max_new_tokens=100)
    assert sched.queue_len == 1
    assert sched.admit(1, 0)
    assert sched.free_slots == 3
    assert sched.pages_free == total_pages - 1  # 200 tokens -> 1 page
    assert sched.slot_of(1) == 0
    assert not sched.admit(1, 1)  # already admitted / unknown

    sched.enqueue(2, prompt_len=900, max_new_tokens=200)  # clamped to 1024
    assert sched.admit(2, 1)
    assert sched.pages_free == total_pages - 1 - 4

    sched.release(1)
    assert sched.free_slots == 3
    assert sched.pages_free == total_pages - 4


def test_scheduler_rejects_when_out_of_pages():
    sched = maybe_scheduler(num_slots=2, max_seq=512, page_size=256)
    sched.enqueue(1, 500, 12)
    assert sched.admit(1, 0)          # takes both of slot-budget... 2 pages
    sched.enqueue(2, 500, 12)
    assert sched.admit(2, 1)
    sched.enqueue(3, 10, 10)
    assert not sched.admit(3, 0)      # slot occupied
    sched.release(1)
    assert sched.admit(3, 0)


def test_varlen_decode_matches_uniform(tiny_serving):
    """With equal lengths, varlen decode == the standard decode step."""
    cfg, params, sparams, sc = tiny_serving
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)))
    cache = S.init_cache(sc, 2)
    logits, cache = S.prefill(sparams, cache, ids, sc)
    tok = jnp.argmax(logits, axis=-1)
    l_uniform, _ = S.decode_step(sparams, cache, tok, sc)
    l_varlen, _ = decode_step_varlen(S.stack_layer_params(sparams), cache,
                                     tok, sc)
    np.testing.assert_allclose(np.asarray(l_uniform, np.float32),
                               np.asarray(l_varlen, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_engine_end_to_end(tiny_serving):
    cfg, params, sparams, sc = tiny_serving
    eng = ServingEngine(sparams, sc, num_slots=2)
    rng = np.random.default_rng(1)
    uids = [eng.add_request(rng.integers(0, cfg.vocab_size, size=pl),
                            max_new_tokens=mnt)
            for pl, mnt in [(6, 4), (9, 6), (5, 3)]]  # 3 requests, 2 slots
    done = eng.run_until_done(max_steps=100)
    assert len(done) == 3
    by_uid = {r.uid: r for r in done}
    assert len(by_uid[uids[0]].output) == 4
    assert len(by_uid[uids[1]].output) == 6
    assert len(by_uid[uids[2]].output) == 3
    for r in done:
        assert all(0 <= t < cfg.vocab_size for t in r.output)


def test_engine_output_matches_batch_generate(tiny_serving):
    """A single request through the engine must reproduce the plain
    generate() tokens (same greedy path)."""
    cfg, params, sparams, sc = tiny_serving
    prompt = np.random.default_rng(2).integers(0, cfg.vocab_size, size=7)
    eng = ServingEngine(sparams, sc, num_slots=2)
    eng.add_request(prompt, max_new_tokens=5)
    done = eng.run_until_done(max_steps=50)
    want = np.asarray(S.generate(sparams, jnp.asarray(prompt[None]), sc,
                                 max_new_tokens=5))[0]
    assert done[0].output == list(want)
