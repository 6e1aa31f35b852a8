"""Sequence (context) parallelism: ring flash attention over the mesh.

The reference has no sequence-parallel story (its long-context evals run
single-GPU, LEval/Baselines/llama3-instruct-test-new.py); on TPU, long-
context prefill past one chip's HBM is a first-class need, and the
TPU-native answer is a RING: shard the sequence over a mesh axis, keep
Q local, and rotate K/V blocks around the ring with `ppermute` while
accumulating flash-style online softmax — collectives ride ICI and
overlap with the per-step attention matmuls under XLA's async collective
scheduling.

Math per ring step t on device i (sl = local sequence length):
  the K/V block that arrives at step t originates from device
  j = (i - t) mod n, i.e. holds global key positions [j*sl, (j+1)*sl).
  Causality in GLOBAL positions: attend iff kpos <= qpos, so blocks from
  j > i contribute nothing (fully masked), j < i attend unmasked, j == i
  applies the local causal triangle.  After n steps every query has seen
  every key exactly once; out = acc / l.

K/V travel UNREPEATED (kv heads only) — for GQA models the ring moves
hkv*d per token instead of h*d, an 8x ICI saving on Llama-3-8B.

All entry points are shard_map-local functions plus `make_sp_prefill`,
which builds the jitted shard_map'd full-model prefill (sequence axis
sharded end-to-end; norms/linears/RoPE are per-token and need no
communication — only attention rings).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import QuantPolicy
def _pvary(x, axes):
    """pvary with fallback: renamed to pcast(x, axis_name, to='varying')
    in newer jax (axis name is positional there)."""
    try:
        return jax.lax.pcast(x, axes, to="varying")
    except (AttributeError, TypeError):
        return jax.lax.pvary(x, axes)


def ring_attention(q, k, v, axis_name: str = "sp"):
    """Causal flash attention with the sequence sharded over `axis_name`.

    Must run inside shard_map. q: (b, sl, h, d) local query shard;
    k, v: (b, sl, hkv, d) local key/value shards (hkv may divide h — GQA
    kv blocks ring unrepeated). Returns (b, sl, h, d), the attention
    output for the local queries over the FULL global sequence.
    """
    n = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    b, sl, h, d = q.shape
    hkv = k.shape[2]
    g = h // hkv
    sm = 1.0 / math.sqrt(d)

    qf = q.astype(jnp.float32).reshape(b, sl, hkv, g, d) * sm
    qpos = me * sl + jnp.arange(sl)  # global query positions

    perm = [(r, (r + 1) % n) for r in range(n)]

    def step(carry, t):
        m, l, acc, kb, vb = carry
        src = (me - t) % n  # global shard that produced this K/V block
        kf = kb.astype(jnp.float32)
        vf = vb.astype(jnp.float32)
        # logits: (b, hkv, g, sl_q, sl_k)
        logits = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf)
        kpos = src * sl + jnp.arange(sl)
        mask = kpos[None, None, None, None, :] <= qpos[None, None, None, :, None]
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1)
        acc_new = (acc * alpha[..., None]
                   + jnp.einsum("bhgqk,bkhd->bhgqd", p, vf))
        # rotate the K/V block one hop around the ring (ICI neighbor copy)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return (m_new, l_new, acc_new, kb, vb), None

    # pvary: the accumulators are built from constants but the scan carries
    # sp-varying data through them — mark them device-varying up front so
    # shard_map's varying-axis check accepts the carry
    m0 = _pvary(jnp.full((b, hkv, g, sl), -jnp.inf, jnp.float32),
                       (axis_name,))
    l0 = _pvary(jnp.zeros((b, hkv, g, sl), jnp.float32), (axis_name,))
    a0 = _pvary(jnp.zeros((b, hkv, g, sl, d), jnp.float32),
                       (axis_name,))
    (m1, l1, a1, _, _), _ = jax.lax.scan(
        step, (m0, l0, a0, k, v), jnp.arange(n))
    out = a1 / jnp.maximum(l1[..., None], 1e-30)
    # (b, hkv, g, sl, d) -> (b, sl, h, d)
    return jnp.moveaxis(out, 3, 1).reshape(b, sl, h, d).astype(v.dtype)


def _sp_layer(lp, x, cos, sin, cfg: ModelConfig, policy: QuantPolicy,
              axis_name: str):
    """One decoder layer on a LOCAL sequence shard. Identical to
    llama.layer_forward except attention rings; cos/sin already hold the
    GLOBAL positions of this shard."""
    from rsq_tpu.core.hadamard import (
        hadamard_transform_last, head_mixing_hadamard, matmul_hadU)
    from rsq_tpu.core.quant import act_fake_quant

    b, sl, _ = x.shape
    hd, nq, nkv = (cfg.head_dim_, cfg.num_attention_heads,
                   cfg.num_key_value_heads)
    h = M.rms_norm(x, lp.get("input_norm"), cfg.rms_norm_eps)
    q = M.linear(h, lp["q"], policy.a).reshape(b, sl, nq, hd)
    k = M.linear(h, lp["k"], policy.a).reshape(b, sl, nkv, hd)
    v = M.linear(h, lp["v"], policy.a)
    v = act_fake_quant(v, policy.v).reshape(b, sl, nkv, hd)
    q = M.apply_rope(q, cos, sin)
    k = M.apply_rope(k, cos, sin)
    if policy.k.enabled:
        dt = jnp.float32 if policy.fp32_had else None
        q = hadamard_transform_last(q, dtype=dt)
        k = hadamard_transform_last(k, dtype=dt)
        k = M._k_fake_quant(k, policy.k, cfg.hidden_size)

    attn = ring_attention(q, k, v, axis_name).reshape(b, sl, nq * hd)
    if policy.online_had_o:
        dt = jnp.float32 if policy.fp32_had else None
        attn = head_mixing_hadamard(attn, head_dim=hd, dtype=dt)
    x = x + M.linear(attn, lp["o"], policy.a)

    h2 = M.rms_norm(x, lp.get("post_norm"), cfg.rms_norm_eps)
    up = M.linear(h2, lp["up"], policy.a)
    gate = M.linear(h2, lp["gate"], policy.a)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(h2.dtype) * up
    if policy.online_had_down:
        dt = jnp.float32 if policy.fp32_had else None
        act = matmul_hadU(act, dtype=dt)
    return x + M.linear(act, lp["down"], policy.a_down_)


def make_sp_prefill(cfg: ModelConfig, policy: QuantPolicy, mesh: Mesh,
                    axis: str = "sp"):
    """Jitted sequence-parallel full-model prefill.

    Returns fn(params, input_ids) -> logits with input_ids (b, s) and
    logits (b, s, V); s must divide evenly by the mesh axis size. Params
    are replicated; activations are sequence-sharded end-to-end, so the
    peak per-device activation memory is s/n of the single-device prefill
    — the capability the reference lacks for 8k+ calibration/eval
    sequences.
    """
    n = mesh.shape[axis]

    def local_fn(params, ids_local, pos_local):
        x = params["embed"][ids_local]
        cos, sin = M.rope_tables(cfg, pos_local[0])
        for lp in params["layers"]:
            x = _sp_layer(lp, x, cos, sin, cfg, policy, axis)
        x = M.rms_norm(x, params.get("final_norm"), cfg.rms_norm_eps)
        return x @ params["lm_head"].astype(x.dtype)

    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis)),
        out_specs=P(None, axis))

    @jax.jit
    def prefill(params, input_ids):
        b, s = input_ids.shape
        assert s % n == 0, f"seqlen {s} must divide over {n} {axis}-shards"
        pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        return sharded(params, input_ids, pos)

    return prefill


def make_sp_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("sp",))
