"""Functional Llama-family decoder.

One pure-pytree implementation covering Llama-2/3, Qwen2.5 and Mistral
(the reference wraps HF torch models and monkeypatches them;
fake_quant/model_utils.py + attn_module.py).  Design choices:

- weights are stored (in_features, out_features) so every projection is
  `x @ W` — the natural MXU layout, and rotations compose as left/right
  matrix multiplies on the pytree;
- quantization behavior is a static `QuantPolicy` argument, not module
  state: the ActQuantWrapper becomes `act_fake_quant` at each linear input,
  the QK rotation monkeypatch becomes an explicit post-RoPE transform;
- layers are a list of per-layer param dicts so the quantization driver can
  stream one layer at a time to the device, while the serving path can stack
  them for a `lax.scan`.

Param pytree schema (all jnp arrays):
  {"embed": (V, d),
   "layers": [{"input_norm": (d,)|None, "post_norm": (d,)|None,
               "q","k","v","o","up","gate","down": {"w": (in, out), "b": (out,)|None}},
              ...],
   "final_norm": (d,)|None,
   "lm_head": (d, V)}
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rsq_tpu.core.hadamard import (
    hadamard_transform_last, head_mixing_hadamard, matmul_hadU)
from rsq_tpu.core.quant import ActQuantConfig, act_fake_quant
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import QuantPolicy

LINEAR_NAMES = ("q", "k", "v", "o", "up", "gate", "down")


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(x, weight, eps):
    """RMSNorm; weight=None is the weightless RMSN used after fusion
    (model_utils.RMSN)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        xf = xf * weight.astype(jnp.float32)
    return xf.astype(dtype)


def linear(x, p, quant: ActQuantConfig | None = None):
    """Quant-then-matmul, the ActQuantWrapper contract
    (quant_utils.py:313-318)."""
    if quant is not None:
        x = act_fake_quant(x, quant)
    y = x @ p["w"].astype(x.dtype)
    if p.get("b") is not None:
        y = y + p["b"].astype(y.dtype)
    return y


def rope_frequencies(cfg: ModelConfig) -> np.ndarray:
    """Inverse frequencies, with optional Llama-3.1 scaling."""
    hd = cfg.head_dim_
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    s = cfg.rope_scaling
    if s is not None:
        low_wl = s.original_max_position_embeddings / s.low_freq_factor
        high_wl = s.original_max_position_embeddings / s.high_freq_factor
        wl = 2 * np.pi / inv
        smooth = (s.original_max_position_embeddings / wl - s.low_freq_factor) / (
            s.high_freq_factor - s.low_freq_factor)
        scaled = np.where(
            wl > low_wl, inv / s.factor,
            np.where(wl < high_wl, inv,
                     (1 - smooth) * inv / s.factor + smooth * inv))
        inv = scaled
    return inv.astype(np.float32)


def rope_tables(cfg: ModelConfig, positions) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables of shape (len(positions), head_dim) in HF half-split
    layout (first half = cos(f_i), duplicated)."""
    inv = jnp.asarray(rope_frequencies(cfg))
    angles = positions.astype(jnp.float32)[:, None] * inv[None, :]
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x, cos, sin):
    """HF-style rotate-half RoPE. x: (..., seq, heads, head_dim);
    cos/sin: (seq, head_dim)."""
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s).astype(x.dtype)


def repeat_kv(x, n_rep: int):
    """(b, s, kv_heads, d) -> (b, s, kv_heads*n_rep, d)."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(b, s, h * n_rep, d)


def _k_fake_quant(k, kcfg, hidden_size):
    """Post-RoPE K quantization (QKRotationWrapper semantics,
    rotation_utils.py:338-357): per-token across all heads (groupsize -1)
    or per-head (groupsize == head_dim)."""
    b, s, h, d = k.shape
    acfg = ActQuantConfig(bits=kcfg.bits, sym=kcfg.sym, clip_ratio=kcfg.clip_ratio)
    if kcfg.groupsize == -1:
        flat = k.reshape(b, s, h * d)
        return act_fake_quant(flat, acfg).reshape(k.shape)
    assert kcfg.groupsize == d, "K-cache supports token-wise or head-wise only"
    return act_fake_quant(k, acfg)


# ---------------------------------------------------------------------------
# Attention (eager, mask-flexible — doubles as the attention-weights source
# for importance weighting; the reference needs a custom eager attention for
# the same reason, attn_module.py:154-286)
# ---------------------------------------------------------------------------

def attention_scores(q, k, mask):
    """softmax(q k^T / sqrt(d) + mask) in f32. q,k: (b, s, h, d) with h
    already repeated. Returns (b, h, s, s) probabilities."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d)
    logits = logits + mask
    return jax.nn.softmax(logits, axis=-1)


def causal_mask(seq_len: int, dtype=jnp.float32):
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    return jnp.where(j <= i, 0.0, jnp.finfo(dtype).min).astype(dtype)


def attention_dense(q, k, v, mask):
    probs = attention_scores(q, k, mask)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def attention_chunked(q, k, v, q_chunk: int = 512, k_chunk: int = 1024):
    """Flash-style causal attention without materializing (H, L, L):
    lax.scan over query chunks, online-softmax fori over key chunks.
    Equivalent to attention_dense with a causal mask; used automatically
    for long sequences (calibration seqlen 4096 / eval 8192 would need
    gigabytes of score matrices otherwise)."""
    b, s, h, d = q.shape
    qc = min(q_chunk, s)
    kc = min(k_chunk, s)
    pad_q = (-s) % qc
    pad_k = (-s) % kc
    sm = 1.0 / math.sqrt(d)
    qp = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    kp_ = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    vp_ = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    nq = (s + pad_q) // qc
    nk = (s + pad_k) // kc
    qb = jnp.moveaxis(qp.reshape(b, nq, qc, h, d), 1, 0)  # (nq, b, qc, h, d)

    def q_block(carry, inp):
        qi, qblk = inp
        qf = qblk.astype(jnp.float32) * sm

        def k_block(j, st):
            m, l, acc = st
            kblk = jax.lax.dynamic_slice(
                kp_, (0, j * kc, 0, 0), (b, kc, h, d)).astype(jnp.float32)
            vblk = jax.lax.dynamic_slice(
                vp_, (0, j * kc, 0, 0), (b, kc, h, d)).astype(jnp.float32)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kblk)
            qpos = qi * qc + jnp.arange(qc)[None, None, :, None]
            kpos = j * kc + jnp.arange(kc)[None, None, None, :]
            logits = jnp.where((kpos <= qpos) & (kpos < s), logits,
                               jnp.finfo(jnp.float32).min)
            m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
            p = jnp.exp(logits - m_new[..., None])
            alpha = jnp.exp(m - m_new)
            l_new = alpha * l + jnp.sum(p, axis=-1)
            acc_new = (acc * alpha[..., None]
                       + jnp.einsum("bhqk,bkhd->bhqd", p, vblk))
            return m_new, l_new, acc_new

        m0 = jnp.full((b, h, qc), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, h, qc), jnp.float32)
        a0 = jnp.zeros((b, h, qc, d), jnp.float32)
        # only key blocks up to this query block matter (causal)
        m1, l1, a1 = jax.lax.fori_loop(0, jnp.minimum(
            (qi * qc + qc + kc - 1) // kc, nk), k_block, (m0, l0, a0))
        out = a1 / jnp.maximum(l1[..., None], 1e-30)
        return carry, jnp.moveaxis(out, 1, 2)  # (b, qc, h, d)

    _, outs = jax.lax.scan(q_block, None, (jnp.arange(nq), qb))
    out = jnp.moveaxis(outs, 0, 1).reshape(b, nq * qc, h, d)
    return out[:, :s].astype(v.dtype)


def attention(q, k, v, mask=None, chunk_threshold: int = 2048):
    """Dispatch: mask=None means plain causal — flash-chunked for long
    sequences, dense otherwise. An explicit mask (custom calibration
    attention) always takes the dense path."""
    s = q.shape[1]
    if mask is not None:
        return attention_dense(q, k, v, mask)
    if s < chunk_threshold:
        return attention_dense(q, k, v, causal_mask(s))
    return attention_chunked(q, k, v)


# ---------------------------------------------------------------------------
# Decoder layer
# ---------------------------------------------------------------------------

def attn_block(lp, h, cos, sin, cfg: ModelConfig, policy: QuantPolicy,
               mask=None, return_probs: bool = False):
    """Self-attention sub-block on *normalized* input h. Returns
    (output_before_residual, probs_or_None)."""
    b, s, _ = h.shape
    hd, nq, nkv = cfg.head_dim_, cfg.num_attention_heads, cfg.num_key_value_heads

    q = linear(h, lp["q"], policy.a).reshape(b, s, nq, hd)
    k = linear(h, lp["k"], policy.a).reshape(b, s, nkv, hd)
    v = linear(h, lp["v"], policy.a)
    v = act_fake_quant(v, policy.v).reshape(b, s, nkv, hd)

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if policy.k.enabled:
        # post-RoPE exact Hadamard on q and k heads, then quantize k
        dt = jnp.float32 if policy.fp32_had else None
        q = hadamard_transform_last(q, dtype=dt)
        k = hadamard_transform_last(k, dtype=dt)
        k = _k_fake_quant(k, policy.k, cfg.hidden_size)

    k = repeat_kv(k, nq // nkv)
    v = repeat_kv(v, nq // nkv)

    probs = None
    if return_probs:
        if mask is None:
            mask = causal_mask(s)
        probs = attention_scores(q, k, mask)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                          preferred_element_type=jnp.float32).astype(v.dtype)
    else:
        attn = attention(q, k, v, mask)

    attn = attn.reshape(b, s, nq * hd)
    if policy.online_had_o:
        dt = jnp.float32 if policy.fp32_had else None
        attn = head_mixing_hadamard(attn, head_dim=hd, dtype=dt)
    out = linear(attn, lp["o"], policy.a)
    return out, probs


def mlp_block(lp, h, policy: QuantPolicy):
    up = linear(h, lp["up"], policy.a)
    gate = linear(h, lp["gate"], policy.a)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype) * up
    if policy.online_had_down:
        dt = jnp.float32 if policy.fp32_had else None
        act = matmul_hadU(act, dtype=dt)
    return linear(act, lp["down"], policy.a_down_)


def layer_forward(lp, x, cos, sin, cfg: ModelConfig, policy: QuantPolicy,
                  mask=None, return_probs: bool = False, layer: int = 0):
    """One decoder layer. x: (b, s, d). `layer` is accepted for family-
    dispatch parity (Gemma-2 alternates sliding-window layers); unused."""
    h = rms_norm(x, lp.get("input_norm"), cfg.rms_norm_eps)
    attn_out, probs = attn_block(lp, h, cos, sin, cfg, policy, mask, return_probs)
    x = x + attn_out
    h2 = rms_norm(x, lp.get("post_norm"), cfg.rms_norm_eps)
    x = x + mlp_block(lp, h2, policy)
    if return_probs:
        return x, probs
    return x


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def embed(params, input_ids):
    return params["embed"][input_ids]


def head(params, x, cfg: ModelConfig):
    x = rms_norm(x, params.get("final_norm"), cfg.rms_norm_eps)
    return x @ params["lm_head"].astype(x.dtype)


@partial(jax.jit, static_argnames=("cfg", "policy"))
def forward(params, input_ids, cfg: ModelConfig, policy: QuantPolicy):
    """Full forward to logits. input_ids: (b, s)."""
    b, s = input_ids.shape
    x = embed(params, input_ids)
    cos, sin = rope_tables(cfg, jnp.arange(s))
    for lp in params["layers"]:
        x = layer_forward(lp, x, cos, sin, cfg, policy, mask=None)
    return head(params, x, cfg)


# ---------------------------------------------------------------------------
# Random init (tests / benchmarks without checkpoints)
# ---------------------------------------------------------------------------

def init_params(cfg: ModelConfig, key=None, dtype=jnp.float32, scale=0.02):
    key = key if key is not None else jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 64 + cfg.num_layers * 16))

    def w(shape):
        return (jax.random.normal(next(ks), shape) * scale).astype(dtype)

    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    qd, kvd = cfg.q_dim, cfg.kv_dim

    def lin(in_d, out_d, bias):
        p = {"w": w((in_d, out_d))}
        p["b"] = jnp.zeros((out_d,), dtype) if bias else None
        return p

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "input_norm": jnp.ones((d,), dtype),
            "post_norm": jnp.ones((d,), dtype),
            "q": lin(d, qd, cfg.attention_bias),
            "k": lin(d, kvd, cfg.attention_bias),
            "v": lin(d, kvd, cfg.attention_bias),
            "o": lin(qd, d, False),
            "up": lin(d, f, False),
            "gate": lin(d, f, False),
            "down": lin(f, d, False),
        })
    return {
        "embed": w((v, d)),
        "layers": layers,
        "final_norm": jnp.ones((d,), dtype),
        "lm_head": w((d, v)),
    }
