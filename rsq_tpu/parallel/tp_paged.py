"""Paged continuous-batching engine over a (dp, tp) device mesh.

Unifies the two serving stacks (VERDICT r1 #4): the page-pool engine
(serving/paged.py — continuous batching, prefix caching, refcounted C++
allocator) and tensor parallelism (parallel/tp.py).  The north-star serving
configuration (BASELINE.md): INT4 weights and the INT4 paged KV cache
tensor-sharded over `tp`, request slots and the page pool sharded over `dp`,
XLA collectives over ICI.

Sharding plan:
  pool (L, P, Hkv, D/2, page): pages over dp, kv-heads over tp.  Each dp
      group owns an independent page range with its OWN allocator + prefix
      cache (page ids are group-local), so appends from different groups
      never race on a replicated buffer.
  page_tables / lengths / next_tok (B, ...): slots over dp.
  weights: col-parallel q/k/v/up/gate, row-parallel o/down (one psum each),
      embeddings / norms / lm_head replicated — same plan as tp.py.

Prefill is admitted in dp-WAVES (chunked, prefix-cache aware): each wave
is ONE mesh program in which every dp group prefills ITS OWN pending
request's tail and writes its own pool shard — admission throughput
scales with dp (VERDICT r4 weak #5: the previous design replicated one
request's forward across all groups, serializing admissions).  Groups
with nothing to admit run the same program on their scratch ("null")
page row with a zero tail; requests whose static shapes differ
(tail bucket, prefix pages) split the wave into one program per shape.
The reference has no multi-device serving at all (SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rsq_tpu.kernels import paged_kv as PKV
from rsq_tpu.parallel.tp import stacked_param_specs
from rsq_tpu.serving.model import ServingConfig
from rsq_tpu.serving.native import make_page_allocator
from rsq_tpu.serving.paged import (PagedRequest, _decode_paged_local,
                                   _prefill_paged_local, prefix_hashes)


def pool_specs():
    return {k: P(None, "dp", "tp", None, None)
            for k in ("kq", "kp", "vq", "vp")}


def shard_pool(pool, mesh: Mesh):
    specs = pool_specs()
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in pool.items()}


# ---------------------------------------------------------------------------
# shard_map-local steps
# ---------------------------------------------------------------------------

def make_paged_tp_step(params, pool, mesh: Mesh, sc: ServingConfig):
    """Jitted shard_map'd (prefill, decode) for the paged TP engine, running
    the SAME copy-free fast bodies as the single-device paged engine
    (serving.paged._decode_paged_local / _prefill_paged_local with
    tp_axis="tp"): stacked scalar-prefetch weight kernels, merged-heads
    self-fold paged attention, aliased pool appends.

    decode(params, pool, page_tables (B, NP), lengths (B,), tokens (B,))
        -> (logits (B, V), pool)
    prefill(params, pool, rows (dp, NP), tails (dp, 1, St), plens (dp,))
        -> (logits (dp, V), pool)   [static prefix kwargs via partial]

    Prefill is a WAVE: every dp group prefills ITS OWN request's tail
    (rows/tails/plens sharded over dp) and writes its own pool shard —
    admission throughput scales with dp instead of every group replicating
    one request's forward (VERDICT r4 weak #5 / next #7).  Groups with no
    request this wave get a null-page row and a zero tail; their writes
    land on their scratch page and their logits are discarded.
    """
    pspecs = stacked_param_specs(params)
    plspecs = pool_specs()

    decode = jax.jit(jax.shard_map(
        partial(_decode_paged_local, sc=sc, tp_axis="tp"), mesh=mesh,
        in_specs=(pspecs, plspecs, P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp", None), plspecs),
        check_vma=False))

    def prefill(params, pool, rows, tails, plens, *, prefix_pages,
                prefix_len):
        # plens ride TRACED through the shard_map (ADVICE r4 #3: static
        # keying compiled one full-depth prefill per prompt length);
        # prefix_pages/prefix_len are shape-bearing (mask width, prefix
        # gather count) and key the trace — the engine partitions each
        # wave by them
        def body(params, pool, row, tail, plen):
            # row (1, NP), tail (1, 1, St), plen (1,): THIS group's request
            return _prefill_paged_local(
                params, pool, row[0], tail[0], sc, prefix_pages,
                prefix_len, plen[0], tp_axis="tp")

        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(pspecs, plspecs, P("dp"), P("dp", None, None),
                      P("dp")),
            out_specs=(P("dp", None), plspecs),
            check_vma=False)
        return fn(params, pool, rows, tails, plens)

    prefill = jax.jit(prefill,
                      static_argnames=("prefix_pages", "prefix_len"),
                      donate_argnums=(1,))
    return prefill, decode


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

class PagedTPEngine:
    """Continuous batching + prefix caching over a (dp, tp) mesh.

    Slots are partitioned across dp groups (group g owns rows
    [g*spg, (g+1)*spg) of the global slot arrays); each group has an
    independent page allocator + prefix cache over its local page range."""

    def __init__(self, params, sc: ServingConfig, mesh: Mesh,
                 num_slots: int = 8, num_pages: int | None = None,
                 page_size: int = 128, eos_token: int | None = None,
                 prefix_caching: bool = True,
                 record_logits: bool = False):
        assert sc.kv_int4, "paged engine serves the INT4 cache"
        self.record_logits = record_logits
        cfg = sc.cfg
        self.mesh = mesh
        self.dp = mesh.shape["dp"]
        assert num_slots % self.dp == 0, "num_slots must divide over dp"
        self.spg = num_slots // self.dp
        self.sc = sc
        self.page = page_size
        self.np_per_slot = -(-sc.max_seq // page_size)
        self.num_slots = num_slots
        self.eos = eos_token
        self.prefix_caching = prefix_caching
        if num_pages is None:
            num_pages = num_slots * self.np_per_slot + self.dp
        assert num_pages % self.dp == 0
        self.pages_per_group = num_pages // self.dp

        from rsq_tpu.parallel.tp import shard_params_stacked
        if "layers_stacked" not in params:
            from rsq_tpu.serving.model import stack_layer_params
            params = stack_layer_params(params)
        self.params = shard_params_stacked(params, mesh)
        pool = PKV.init_pool(cfg.num_layers, num_pages,
                             cfg.num_key_value_heads, cfg.head_dim_,
                             page_size)
        self.pool = shard_pool(pool, mesh)
        self._prefill, self._decode = make_paged_tp_step(
            self.params, self.pool, mesh, sc)

        self.allocs = [make_page_allocator(self.pages_per_group)
                       for _ in range(self.dp)]
        self.null_pages = np.asarray(
            [a.alloc(1)[0] for a in self.allocs], np.int32)
        self.page_tables = np.stack([
            np.full((self.spg, self.np_per_slot), self.null_pages[g],
                    np.int32) for g in range(self.dp)
        ]).reshape(num_slots, self.np_per_slot)
        self.lengths = np.zeros((num_slots,), np.int32)
        self.next_tok = np.zeros((num_slots,), np.int32)
        self.slots: list[PagedRequest | None] = [None] * num_slots
        self.queue: list[PagedRequest] = []
        self._uid = 0

    def _group_of(self, slot: int) -> int:
        return slot // self.spg

    # -- admission ------------------------------------------------------

    def add_request(self, prompt_ids, max_new_tokens: int = 32) -> int:
        self._uid += 1
        req = PagedRequest(self._uid, np.asarray(prompt_ids, np.int32),
                           max_new_tokens)
        self.queue.append(req)
        return req.uid

    def _plan(self, req: PagedRequest, g: int) -> dict | None:
        """Allocate pages for `req` in group `g` and compute its prefill
        shapes.  Returns None (nothing allocated) under page pressure."""
        alloc = self.allocs[g]
        plen = len(req.prompt_ids)
        total = min(plen + req.max_new_tokens, self.sc.max_seq)
        need_total = -(-total // self.page)

        reused: list[int] = []
        if self.prefix_caching:
            limit = (plen - 1) // self.page
            for h in prefix_hashes(req.prompt_ids, self.page)[:limit]:
                pid = alloc.prefix_lookup(h)
                if pid < 0:
                    break
                reused.append(pid)

        fresh = alloc.alloc(need_total - len(reused))
        if fresh is None:
            for pid in reused:
                alloc.decref(pid)
            return None

        pages = reused + fresh
        prefix_pages = len(reused)
        tail = req.prompt_ids[prefix_pages * self.page:]
        # BUCKET the tail to a power-of-two page count: every distinct tail
        # length otherwise compiles its own full-depth prefill program
        # (minutes each on the remote compile service).  Extra pages write
        # through the row's null-page entries (garbage page, never read:
        # attention masks padding causally, decode masks by lengths).
        n_tail = -(-len(tail) // self.page)
        cap = self.np_per_slot - prefix_pages
        bucket = 1
        while bucket < n_tail:
            bucket *= 2
        st_pad = min(bucket, cap) * self.page
        row = np.full((self.np_per_slot,), self.null_pages[g], np.int32)
        row[:len(pages)] = pages
        return {"req": req, "g": g, "pages": pages, "row": row,
                "tail": tail, "plen": plen, "st_pad": st_pad,
                "prefix_pages": prefix_pages}

    def _prefill_wave(self, plans: list[dict], st_pad: int,
                      prefix_pages: int):
        """ONE mesh program admitting up to dp requests — one per group.
        Groups without a plan this wave run on their null-page row with a
        zero tail: their pool writes land on scratch, their logits are
        discarded."""
        rows = np.stack([np.full((self.np_per_slot,), self.null_pages[g],
                                 np.int32) for g in range(self.dp)])
        tails = np.zeros((self.dp, 1, st_pad), np.int32)
        # idle groups read logits at index prefix_len (plen-prefix_len-1=0)
        plens = np.full((self.dp,), prefix_pages * self.page + 1, np.int32)
        for p in plans:
            g = p["g"]
            rows[g] = p["row"]
            tails[g, 0, :len(p["tail"])] = p["tail"]
            plens[g] = p["plen"]

        logits, self.pool = self._prefill(
            self.params, self.pool, jnp.asarray(rows), jnp.asarray(tails),
            jnp.asarray(plens), prefix_pages=prefix_pages,
            prefix_len=prefix_pages * self.page)

        for p in plans:
            req, g = p["req"], p["g"]
            if self.prefix_caching:
                hashes = prefix_hashes(req.prompt_ids, self.page)
                for j, h in enumerate(hashes):
                    if j < len(p["pages"]):
                        self.allocs[g].prefix_insert(h, p["pages"][j])
            lg = logits[g]
            tok = int(jnp.argmax(lg))
            req.output.append(tok)
            if self.record_logits:
                req.logit_trace.append(np.asarray(lg, np.float32))
            req.pages = p["pages"]
            req.reused_pages = p["prefix_pages"]
            slot = p["slot"]
            self.slots[slot] = req
            self.page_tables[slot] = p["row"]
            self.lengths[slot] = p["plen"]
            self.next_tok[slot] = tok

    def _admit(self):
        while self.queue:
            # build one wave: at most one pending request per dp group
            # with a free slot and allocatable pages
            plans = []
            for g in range(self.dp):
                if not self.queue:
                    break
                slot = next(
                    (s for s in range(g * self.spg, (g + 1) * self.spg)
                     if self.slots[s] is None), None)
                if slot is None:
                    continue
                plan = self._plan(self.queue[0], g)
                if plan is None:
                    continue  # this group is out of pages; try the others
                self.queue.pop(0)
                plan["slot"] = slot
                plans.append(plan)
            if not plans:
                break
            # requests whose shapes agree share ONE program; mixed shapes
            # split the wave (prefix_pages/st_pad are trace keys)
            by_key: dict = {}
            for p in plans:
                by_key.setdefault((p["st_pad"], p["prefix_pages"]),
                                  []).append(p)
            for (st_pad, prefix_pages), ps in by_key.items():
                self._prefill_wave(ps, st_pad, prefix_pages)

    def _retire(self, slot: int):
        req = self.slots[slot]
        g = self._group_of(slot)
        req.done = True
        for pid in req.pages:
            self.allocs[g].decref(pid)
        self.slots[slot] = None
        self.page_tables[slot] = self.null_pages[g]
        self.lengths[slot] = 0

    # -- stepping ---------------------------------------------------------

    def step(self) -> list[PagedRequest]:
        self._admit()
        if all(s is None for s in self.slots):
            return []
        logits, self.pool = self._decode(
            self.params, self.pool, jnp.asarray(self.page_tables),
            jnp.asarray(self.lengths), jnp.asarray(self.next_tok))
        self.lengths += 1
        toks = np.asarray(jnp.argmax(logits, axis=-1))
        finished = []
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            tok = int(toks[slot])
            req.output.append(tok)
            if self.record_logits:
                req.logit_trace.append(np.asarray(logits[slot], np.float32))
            self.next_tok[slot] = tok
            hit_eos = self.eos is not None and tok == self.eos
            if (len(req.output) >= req.max_new_tokens or hit_eos
                    or int(self.lengths[slot]) + 1 >= self.sc.max_seq):
                finished.append(req)
                self._retire(slot)
        return finished

    def run_until_done(self, max_steps: int = 10_000) -> list[PagedRequest]:
        done = []
        for _ in range(max_steps):
            done += self.step()
            if not self.queue and all(s is None for s in self.slots):
                break
        return done

    @property
    def cache_stats(self) -> dict:
        out = {"hits": 0, "misses": 0, "evictions": 0, "free_pages": 0,
               "cached_pages": 0}
        for a in self.allocs:
            s = a.stats
            for k in ("hits", "misses", "evictions"):
                out[k] += s[k]
            out["free_pages"] += a.free_count
            out["cached_pages"] += a.cached_count
        return out
