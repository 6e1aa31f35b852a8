"""Tensor/data-parallel serving over a device mesh.

The reference is single-GPU (SURVEY.md §2.4: no torch.distributed anywhere);
this module is new capability designed for the north star: INT4 weights and
the quantized KV cache tensor-sharded over the `tp` mesh axis, batch over
`dp`, with XLA collectives over ICI.

Sharding plan (per decoder layer, weights in (in, out) layout):
  q/k/v/up/gate : output dim over tp  -> no comms (column parallel)
  o/down        : input  dim over tp  -> one psum each (row parallel)
  KV cache      : kv-head dim over tp, batch over dp -> attention is local
  embed/norms/lm_head: replicated
Online Hadamards mix across ALL heads / the whole intermediate dim, so under
tp they run as all_gather -> transform -> local slice (cheap at decode:
a few KB per step; a distributed butterfly is the planned optimization).

Everything runs inside ONE shard_map per step so Pallas kernels see local
shards and XLA overlaps the psums with subsequent compute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rsq_tpu.core.hadamard import hadamard_transform_last
from rsq_tpu.kernels import kv_cache as KVK
from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.serving.model import ServingConfig, serving_linear


def make_mesh(n_devices: int | None = None, dp: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    tp = n // dp
    return Mesh(np.array(devs[:n]).reshape(dp, tp), ("dp", "tp"))


# ---------------------------------------------------------------------------
# Param / cache partition specs
# ---------------------------------------------------------------------------

def _linear_spec(kind: str):
    """kind: col (out over tp) | row (in over tp) | rep.

    "sh" is the E8P affine per-tensor scalar scale (replicated); legacy
    "codes"/"e8p_scale" checkpoints are replicated too — the affine "wp"
    shards like any planar int4 weight (ADVICE r2 #3)."""
    e8p = {"sh": P(), "codes": P(), "e8p_scale": P()}
    if kind == "col":
        return {"wp": P(None, "tp"), "scale": P("tp"), "b": P("tp"),
                "w": P(None, "tp"), **e8p}
    if kind == "row":
        return {"wp": P("tp", None), "scale": P(), "b": P(),
                "w": P("tp", None), **e8p}
    return {"wp": P(), "scale": P(), "b": P(), "w": P(), **e8p}


_LAYER_KINDS = {"q": "col", "k": "col", "v": "col", "o": "row",
                "up": "col", "gate": "col", "down": "row"}


def serving_param_specs(params):
    """PartitionSpec pytree matching a serving params pytree."""
    def layer_spec(lp):
        out = {}
        for name, p in lp.items():
            if name in _LAYER_KINDS:
                spec = _linear_spec(_LAYER_KINDS[name])
                out[name] = {k: (spec[k] if v is not None else None)
                             for k, v in p.items()}
            else:
                out[name] = P() if p is not None else None
        return out
    out = {
        "embed": P(),
        "final_norm": P() if params["final_norm"] is not None else None,
        "layers": [layer_spec(lp) for lp in params["layers"]],
    }
    for k in ("lm_head", "lm_head_q", "lm_head_scale"):
        if k in params:
            out[k] = P()
    return out


def cache_specs(cache):
    out = {}
    for k, v in cache.items():
        if k == "length":
            out[k] = P("dp")
        else:
            out[k] = P(None, "dp", "tp", None, None)
    return out


def shard_params(params, mesh: Mesh):
    specs = serving_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
        if x is not None else None, params, specs,
        is_leaf=lambda x: x is None)


def shard_cache(cache, mesh: Mesh):
    specs = cache_specs(cache)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in cache.items()}


def _resharder(mesh: Mesh, specs):
    """fn(tree) -> tree with each leaf placed on its declared NamedSharding.

    jit refuses committed arrays living on a different device set than the
    mesh ("Received incompatible devices"), so the step callables returned
    by make_tp_step* would explode on the first token/param array a user
    feeds from a prior single-device computation (VERDICT r4 weak #1).
    Leaves already carrying the right sharding pass through untouched, so
    the steady-state decode loop (cache threaded from the previous step)
    pays only a per-leaf attribute compare."""
    shardings = jax.tree_util.tree_map(
        lambda s: None if s is None else NamedSharding(mesh, s), specs,
        is_leaf=lambda x: x is None or isinstance(x, P))

    def put(tree):
        return jax.tree_util.tree_map(
            lambda x, sh: x if (x is None or
                                getattr(x, "sharding", None) == sh)
            else jax.device_put(x, sh),
            tree, shardings, is_leaf=lambda x: x is None)
    return put


# ---------------------------------------------------------------------------
# shard_map-local layer steps
# ---------------------------------------------------------------------------

def _gathered_transform(x, transform, axis_name="tp"):
    """all_gather the tp-sharded last dim, apply `transform`, return this
    shard's slice (for global Hadamards over a sharded dim)."""
    tp = jax.lax.axis_size(axis_name)
    if tp == 1:
        return transform(x)
    full = jax.lax.all_gather(x, axis_name, axis=-1, tiled=True)
    full = transform(full)
    idx = jax.lax.axis_index(axis_name)
    shard = full.shape[-1] // tp
    return jax.lax.dynamic_slice_in_dim(full, idx * shard, shard, axis=-1)


def _shard_butterfly(x, axis_name="tp"):
    """Apply the H_tp factor across the shard index: log2(tp) ppermute
    rounds of pairwise exchange + signed add.  With contiguous (high-bit)
    sharding, H_{tp*n} = H_tp (x) H_n, so a LOCAL transform followed by this
    butterfly equals the global transform — traffic is log2(tp) shard-sized
    exchanges instead of a (tp-1)/tp all_gather of the full dim."""
    tp = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    r = 1
    while r < tp:
        perm = [(i, i ^ r) for i in range(tp)]
        recv = jax.lax.ppermute(x, axis_name, perm)
        sign = jnp.where((idx & r) == 0, 1.0, -1.0).astype(x.dtype)
        x = recv + sign * x
        r <<= 1
    return x


def distributed_matmul_hadU(x, axis_name="tp"):
    """matmul_hadU over a tp-sharded (contiguous) last dim, pow2 global size:
    local unnormalized fwht + shard butterfly + 1/sqrt(n_global)."""
    from rsq_tpu.core.hadamard import fwht, is_pow2
    tp = jax.lax.axis_size(axis_name)
    n_local = x.shape[-1]
    assert is_pow2(n_local) and is_pow2(tp), "pow2 dims only; use the gather path"
    xf = fwht(x.astype(jnp.float32))
    xf = _shard_butterfly(xf, axis_name)
    return (xf / np.sqrt(n_local * tp)).astype(x.dtype)


def distributed_head_mixing(x, head_dim: int, axis_name="tp"):
    """head_mixing_hadamard with heads sharded contiguously over tp
    (pow2 local head count): local head-mix + shard butterfly."""
    from rsq_tpu.core.hadamard import fwht, is_pow2
    tp = jax.lax.axis_size(axis_name)
    n = x.shape[-1]
    heads_l = n // head_dim
    assert is_pow2(heads_l) and is_pow2(tp)
    xs = x.reshape(*x.shape[:-1], heads_l, head_dim).astype(jnp.float32)
    xs = fwht(xs, axis=-2)
    xs = _shard_butterfly(xs, axis_name)
    out = xs / np.sqrt(heads_l * tp)
    return out.reshape(x.shape).astype(x.dtype)


def _mix_heads(attn, hd: int, cfg: ModelConfig, axis_name="tp"):
    """Online head-mixing Hadamard under tp: butterfly when head counts are
    pow2, else gather->transform->slice."""
    from rsq_tpu.core.hadamard import head_mixing_hadamard, is_pow2
    nq = cfg.num_attention_heads
    heads_l = attn.shape[-1] // hd
    if is_pow2(nq) and is_pow2(heads_l):
        return distributed_head_mixing(attn, hd, axis_name)
    return _gathered_transform(
        attn, lambda a: head_mixing_hadamard(a, head_dim=hd), axis_name)


def _mix_intermediate(act, cfg: ModelConfig, axis_name="tp"):
    """Online full Hadamard on the (sharded) MLP intermediate dim: butterfly
    when the global dim is pow2; the K-block case (e.g. 14336 = 28*512)
    mixes across non-pow2 blocks and takes the gather path."""
    from rsq_tpu.core.hadamard import is_pow2
    from rsq_tpu.kernels.hadamard_mxu import hadamard_transform
    if is_pow2(cfg.intermediate_size) and is_pow2(act.shape[-1]):
        return distributed_matmul_hadU(act, axis_name)
    return _gathered_transform(act, hadamard_transform, axis_name)


def _local_decode_layer(lp, x, cache, layer, cos, sin, pos, cfg: ModelConfig,
                        sc: ServingConfig):
    """Decode layer on LOCAL shards inside shard_map. x: (Bl, 1, d) replicated
    across tp; q/k/v produce local heads; o/down psum."""
    from rsq_tpu.serving.model import _append_decode
    tp = jax.lax.axis_size("tp")
    b = x.shape[0]
    hd = cfg.head_dim_
    nq_l = cfg.num_attention_heads // tp
    nkv_l = cfg.num_key_value_heads // tp

    h = M.rms_norm(x, lp.get("input_norm"), cfg.rms_norm_eps)
    q = serving_linear(h, lp["q"], sc, decode=True).reshape(b, 1, nq_l, hd)
    k = serving_linear(h, lp["k"], sc, decode=True).reshape(b, 1, nkv_l, hd)
    v = serving_linear(h, lp["v"], sc, decode=True).reshape(b, 1, nkv_l, hd)
    q = M.apply_rope(q, cos, sin)
    k = M.apply_rope(k, cos, sin)
    cache = _append_decode(cache, layer, k, v, pos, sc)

    lengths = cache["length"] + 1
    qh = q.reshape(b, nq_l, hd)
    if sc.kv_int4:
        if sc.kv_hadamard:
            qh = hadamard_transform_last(qh)
        attn = KVK.int4_decode_attention(
            qh, cache["kq"][layer], cache["kp"][layer],
            cache["vq"][layer], cache["vp"][layer], lengths)
    else:
        S = cache["k"].shape[3]
        nrep = nq_l // nkv_l
        kf = jnp.repeat(cache["k"][layer], nrep, axis=1)
        vf = jnp.repeat(cache["v"][layer], nrep, axis=1)
        qg = qh.astype(jnp.float32)
        logits = jnp.einsum("bhd,bhsd->bhs", qg, kf.astype(jnp.float32))
        logits = logits / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        valid = jnp.arange(S)[None, None, :] < lengths[:, None, None]
        logits = jnp.where(valid, logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhs,bhsd->bhd", p, vf.astype(jnp.float32))
        attn = attn.astype(x.dtype)
    attn = attn.reshape(b, 1, nq_l * hd)

    if sc.online_had:
        attn = _mix_heads(attn, hd, cfg)
    o = serving_linear(attn, lp["o"], sc, tp_axis="tp", decode=True)
    o = jax.lax.psum(o, "tp").astype(x.dtype)
    x = x + o

    h2 = M.rms_norm(x, lp.get("post_norm"), cfg.rms_norm_eps)
    up = serving_linear(h2, lp["up"], sc, decode=True)
    gate = serving_linear(h2, lp["gate"], sc, decode=True)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(h2.dtype) * up
    if sc.online_had:
        act = _mix_intermediate(act, cfg)
    down = serving_linear(act, lp["down"], sc, tp_axis="tp", decode=True)
    down = jax.lax.psum(down, "tp").astype(x.dtype)
    return x + down, cache


def _local_prefill_layer(lp, x, cache, layer, cos, sin, mask,
                         cfg: ModelConfig, sc: ServingConfig):
    from rsq_tpu.serving.model import _write_prefill
    tp = jax.lax.axis_size("tp")
    b, s, _ = x.shape
    hd = cfg.head_dim_
    nq_l = cfg.num_attention_heads // tp
    nkv_l = cfg.num_key_value_heads // tp

    h = M.rms_norm(x, lp.get("input_norm"), cfg.rms_norm_eps)
    q = serving_linear(h, lp["q"], sc, decode=False).reshape(b, s, nq_l, hd)
    k = serving_linear(h, lp["k"], sc, decode=False).reshape(b, s, nkv_l, hd)
    v = serving_linear(h, lp["v"], sc, decode=False).reshape(b, s, nkv_l, hd)
    q = M.apply_rope(q, cos, sin)
    k = M.apply_rope(k, cos, sin)
    cache = _write_prefill(cache, layer, k, v, sc)
    attn = M.attention(q, M.repeat_kv(k, nq_l // nkv_l),
                       M.repeat_kv(v, nq_l // nkv_l), mask)
    attn = attn.reshape(b, s, nq_l * hd)
    if sc.online_had:
        attn = _mix_heads(attn, hd, cfg)
    x = x + jax.lax.psum(
        serving_linear(attn, lp["o"], sc, tp_axis="tp", decode=False),
        "tp").astype(x.dtype)
    h2 = M.rms_norm(x, lp.get("post_norm"), cfg.rms_norm_eps)
    up = serving_linear(h2, lp["up"], sc, decode=False)
    gate = serving_linear(h2, lp["gate"], sc, decode=False)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(h2.dtype) * up
    if sc.online_had:
        act = _mix_intermediate(act, cfg)
    return x + jax.lax.psum(
        serving_linear(act, lp["down"], sc, tp_axis="tp", decode=False),
        "tp").astype(x.dtype), cache


# ---------------------------------------------------------------------------
# shard_map entry points
# ---------------------------------------------------------------------------

def _prefill_local(params, cache, input_ids, sc: ServingConfig):
    cfg = sc.cfg
    b, s = input_ids.shape
    x = params["embed"][input_ids].astype(jnp.bfloat16)
    cos, sin = M.rope_tables(cfg, jnp.arange(s))
    # mask=None -> M.attention dispatches to the flash-chunked path for long
    # prompts instead of materializing an (s, s) mask (VERDICT weak #4)
    mask = None
    for i, lp in enumerate(params["layers"]):
        x, cache = _local_prefill_layer(lp, x, cache, i, cos, sin, mask, cfg, sc)
    cache["length"] = cache["length"] + s
    x = M.rms_norm(x[:, -1:], params.get("final_norm"), cfg.rms_norm_eps)
    from rsq_tpu.serving.model import lm_head_logits
    logits = lm_head_logits(params, x)[:, 0]
    return logits, cache


def _decode_local(params, cache, token_ids, sc: ServingConfig):
    cfg = sc.cfg
    pos = cache["length"]                    # (Bl,) per-slot positions
    x = params["embed"][token_ids][:, None, :].astype(jnp.bfloat16)
    cos, sin = M.rope_tables(cfg, pos)
    cos, sin = cos[:, None, :], sin[:, None, :]
    for i, lp in enumerate(params["layers"]):
        x, cache = _local_decode_layer(lp, x, cache, i, cos, sin, pos, cfg, sc)
    cache["length"] = cache["length"] + 1
    x = M.rms_norm(x, params.get("final_norm"), cfg.rms_norm_eps)
    from rsq_tpu.serving.model import lm_head_logits
    logits = lm_head_logits(params, x)[:, 0]
    return logits, cache


def stacked_param_specs(params):
    """PartitionSpec pytree for STACKED serving params (stack_layer_params
    layout): each per-layer leaf gains a leading (replicated) L dim on top
    of its unstacked spec.  Fused plane-major layouts (wp2/wpm) are
    single-device-only and rejected here."""
    ls = params["layers_stacked"]

    def linear_spec(name, p):
        base = _linear_spec(_LAYER_KINDS[name])
        out = {}
        for k, v in p.items():
            if v is None:
                out[k] = None
            elif k in ("wp2", "wpm", "scales2", "scale2", "bs"):
                raise ValueError(
                    f"fused plane-major layout ({name}.{k}) is single-device "
                    "only; shard plain packed params (pack, then stack)")
            elif k in base:
                out[k] = P(*((None,) + tuple(base[k])))
            else:
                raise ValueError(f"no TP spec for stacked leaf {name}.{k}")
        return out

    lspec = {}
    for name, p in ls.items():
        if name in _LAYER_KINDS:
            lspec[name] = linear_spec(name, p)
        else:
            lspec[name] = P() if p is not None else None
    out = {
        "embed": P(),
        "final_norm": P() if params["final_norm"] is not None else None,
        "layers_stacked": lspec,
    }
    for k in ("lm_head", "lm_head_q", "lm_head_scale"):
        if k in params:
            out[k] = P()
    return out


def shard_params_stacked(params, mesh: Mesh):
    specs = stacked_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
        if x is not None else None, params, specs,
        is_leaf=lambda x: x is None)


def make_tp_step_fast(params, cache, mesh: Mesh, sc: ServingConfig):
    """Jitted shard_map'd (prefill, decode) over STACKED params running the
    copy-free fast path (serving.model._decode_step_fast / _prefill_fast
    with tp_axis="tp"): scalar-prefetch stacked weight kernels, in-kernel
    self-fold attention against the stacked local cache, aliased Pallas
    appends — no per-layer cache or weight slice anywhere in the decode
    HLO (VERDICT r3 weak #1)."""
    from rsq_tpu.serving.model import _decode_step_fast, _prefill_fast
    pspecs = stacked_param_specs(params)
    cspecs = cache_specs(cache)

    prefill_j = jax.jit(jax.shard_map(
        partial(_prefill_fast, sc=sc, tp_axis="tp"), mesh=mesh,
        in_specs=(pspecs, cspecs, P("dp", None)),
        out_specs=(P("dp", None), cspecs),
        check_vma=False))
    decode_j = jax.jit(jax.shard_map(
        partial(_decode_step_fast, sc=sc, tp_axis="tp"), mesh=mesh,
        in_specs=(pspecs, cspecs, P("dp")),
        out_specs=(P("dp", None), cspecs),
        check_vma=False))
    put_p, put_c = _resharder(mesh, pspecs), _resharder(mesh, cspecs)
    put_ids = _resharder(mesh, P("dp", None))
    put_tok = _resharder(mesh, P("dp"))

    def prefill(p, c, ids):
        return prefill_j(put_p(p), put_c(c), put_ids(ids))

    def decode(p, c, tok):
        return decode_j(put_p(p), put_c(c), put_tok(tok))

    prefill.lower, decode.lower = prefill_j.lower, decode_j.lower
    return prefill, decode


def make_tp_step(params, cache, mesh: Mesh, sc: ServingConfig):
    """Build jitted shard_map'd (prefill, decode) callables for this mesh."""
    pspecs = serving_param_specs(params)
    cspecs = cache_specs(cache)

    prefill_j = jax.jit(jax.shard_map(
        partial(_prefill_local, sc=sc), mesh=mesh,
        in_specs=(pspecs, cspecs, P("dp", None)),
        out_specs=(P("dp", None), cspecs),
        check_vma=False))
    decode_j = jax.jit(jax.shard_map(
        partial(_decode_local, sc=sc), mesh=mesh,
        in_specs=(pspecs, cspecs, P("dp")),
        out_specs=(P("dp", None), cspecs),
        check_vma=False))
    put_p, put_c = _resharder(mesh, pspecs), _resharder(mesh, cspecs)
    put_ids = _resharder(mesh, P("dp", None))
    put_tok = _resharder(mesh, P("dp"))

    def prefill(p, c, ids):
        return prefill_j(put_p(p), put_c(c), put_ids(ids))

    def decode(p, c, tok):
        return decode_j(put_p(p), put_c(c), put_tok(tok))

    prefill.lower, decode.lower = prefill_j.lower, decode_j.lower
    return prefill, decode
