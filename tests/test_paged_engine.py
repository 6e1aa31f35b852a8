"""Paged serving engine: correctness vs the contiguous path, prefix-cache
reuse, and page accounting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.serving import model as S
from rsq_tpu.serving.native import NativePageAllocator, PyPageAllocator
from rsq_tpu.serving.paged import (
    PagedServingEngine, prefix_hashes)
from rsq_tpu.serving.params import to_serving_params

PAGE = 16  # lane-major axis; tests run interpret mode so sub-128 is fine


@pytest.fixture(scope="module")
def tiny_serving():
    cfg = ModelConfig.tiny(num_layers=2, intermediate_size=128)
    params = M.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    sparams = to_serving_params(params, {}, cfg)
    sc = S.ServingConfig(model=cfg, a4=False, kv_int4=True, kv_hadamard=True,
                         online_had=False, max_seq=64)
    return cfg, params, sparams, sc


def test_prefix_hashes_position_dependent():
    a = prefix_hashes(np.arange(64), 16)
    b = prefix_hashes(np.arange(64), 16)
    assert a == b and len(a) == 4
    # same tokens, different earlier content -> different later hashes
    c = prefix_hashes(np.concatenate([[99], np.arange(63)]), 16)
    assert a[1] != c[1]


@pytest.mark.parametrize("alloc_cls", [NativePageAllocator, PyPageAllocator])
def test_page_allocator_semantics(alloc_cls):
    a = alloc_cls(6)
    ids = a.alloc(3)
    assert sorted(ids) == [0, 1, 2] and a.free_count == 3
    assert a.prefix_insert(111, ids[0]) == ids[0]
    assert a.prefix_insert(111, ids[1]) == ids[0]  # duplicate canonicalizes
    for pid in ids:
        a.decref(pid)
    # cached page parks in LRU; uncached ones go straight back
    assert a.free_count == 5 and a.cached_count == 1
    assert a.prefix_lookup(111) == ids[0]
    assert a.prefix_lookup(222) == -1
    a.decref(ids[0])
    got = a.alloc(6)  # forces eviction of the cached page
    assert got is not None and a.cached_count == 0
    assert a.stats["evictions"] == 1 and a.stats["hits"] == 1


def test_paged_engine_matches_generate(tiny_serving):
    cfg, params, sparams, sc = tiny_serving
    prompt = np.random.default_rng(2).integers(0, cfg.vocab_size, size=7)
    eng = PagedServingEngine(sparams, sc, num_slots=2, page_size=PAGE,
                             prefix_caching=False)
    eng.add_request(prompt, max_new_tokens=5)
    done = eng.run_until_done(max_steps=50)
    want = np.asarray(S.generate(sparams, jnp.asarray(prompt[None]), sc,
                                 max_new_tokens=5))[0]
    assert done[0].output == list(want)


def test_paged_engine_multi_request(tiny_serving):
    cfg, params, sparams, sc = tiny_serving
    eng = PagedServingEngine(sparams, sc, num_slots=2, page_size=PAGE)
    rng = np.random.default_rng(1)
    uids = [eng.add_request(rng.integers(0, cfg.vocab_size, size=pl),
                            max_new_tokens=mnt)
            for pl, mnt in [(6, 4), (19, 6), (5, 3)]]  # 3 requests, 2 slots
    done = eng.run_until_done(max_steps=200)
    assert len(done) == 3
    by_uid = {r.uid: r for r in done}
    assert [len(by_uid[u].output) for u in uids] == [4, 6, 3]
    # all pages returned (cached prefix pages park in the LRU, not free)
    total = eng.alloc.free_count + eng.alloc.cached_count + 1  # +null page
    assert total == eng.pool["kq"].shape[1]


def test_prefix_cache_reuse(tiny_serving):
    cfg, params, sparams, sc = tiny_serving
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, cfg.vocab_size, size=3 * PAGE + 5)
    eng = PagedServingEngine(sparams, sc, num_slots=1, page_size=PAGE)

    eng.add_request(prompt, max_new_tokens=4)
    first = eng.run_until_done(max_steps=50)[0]
    assert eng.alloc.cached_count == 3  # three full prompt pages registered

    eng.add_request(prompt, max_new_tokens=4)
    second = eng.run_until_done(max_steps=50)[0]
    stats = eng.cache_stats
    assert stats["hits"] == 3  # all three full pages reused
    assert second.reused_pages == 3
    assert second.output == first.output

    # a prompt sharing only the first page reuses exactly one
    p2 = np.concatenate([prompt[:PAGE],
                         rng.integers(0, cfg.vocab_size, size=PAGE + 3)])
    eng.add_request(p2, max_new_tokens=3)
    third = eng.run_until_done(max_steps=50)[0]
    assert third.reused_pages == 1
    assert len(third.output) == 3


def test_paged_engine_under_page_pressure(tiny_serving):
    """Pool sized for ~1.2 requests: admission must wait for retirements
    and every request still completes."""
    cfg, params, sparams, sc = tiny_serving
    rng = np.random.default_rng(4)
    eng = PagedServingEngine(sparams, sc, num_slots=2, page_size=PAGE,
                             num_pages=4)  # null + 3 usable
    for _ in range(3):
        eng.add_request(rng.integers(0, cfg.vocab_size, size=PAGE + 2),
                        max_new_tokens=4)
    done = eng.run_until_done(max_steps=300)
    assert len(done) == 3
    assert all(len(r.output) == 4 for r in done)
