"""Functional Gemma-2 decoder (google/gemma-2-9b-it / -27b-it).

Gemma-2 is in the reference's supported-model list (fake_quant/utils.py:22-23)
with its own loader (model_utils.py:81) and eval special-casing
(eval_utils.py:85).  The reference's `fuse_layer_norms` raises for Gemma
(rotation_utils.py:61-68), i.e. upstream supports Gemma-2 for GPTQ/RTN
WITHOUT rotation — this port matches that contract (quantize/rotation.py
rejects family="gemma2").

Architectural deltas vs the Llama family, all data in ModelConfig:
  - embeddings scaled by sqrt(hidden_size);
  - RMSNorm with the (1 + w) convention, in float32;
  - FOUR norms per layer: input / post-attention (applied to the attention
    OUTPUT before the residual add) / pre-feedforward / post-feedforward;
  - GeGLU MLP (gelu_tanh(gate) * up);
  - attention scale = query_pre_attn_scalar**-0.5 (not head_dim);
  - attention-logit softcapping tanh(x/c)*c and final-logit softcapping;
  - alternating sliding-window attention (even layers, HF layout);
  - tied embeddings.

Param pytree schema mirrors models/llama.py with extra norms:
  layers[i] = {"input_norm", "post_attn_norm", "pre_ff_norm",
               "post_ff_norm": (d,) weights,
               "q","k","v","o","up","gate","down": {"w", "b"}}
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rsq_tpu.core.hadamard import hadamard_transform_last, head_mixing_hadamard, matmul_hadU
from rsq_tpu.core.quant import act_fake_quant
from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import QuantPolicy

LINEAR_NAMES = ("q", "k", "v", "o", "up", "gate", "down")
GROUPS = (("q", "k", "v"), ("o",), ("up", "gate"), ("down",))


def rms_norm(x, weight, eps):
    """Gemma convention: x_hat * (1 + w), computed in float32."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        xf = xf * (1.0 + weight.astype(jnp.float32))
    return xf.astype(dtype)


def _softcap(logits, cap):
    if cap is None:
        return logits
    return jnp.tanh(logits / cap) * cap


def _mask_for_layer(s: int, layer: int, cfg: ModelConfig):
    """Causal mask, with the sliding window on even layers (HF Gemma2:
    `sliding_window if not bool(layer_idx % 2)`)."""
    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    ok = j <= i
    if cfg.sliding_window is not None and layer % 2 == 0:
        ok = ok & (i - j < cfg.sliding_window)
    return jnp.where(ok, 0.0, jnp.finfo(jnp.float32).min)


def attention_scores(q, k, mask, cfg: ModelConfig):
    """softmax(softcap(q k^T * scale) + mask) in f32; h already repeated."""
    scale = (cfg.query_pre_attn_scalar or cfg.head_dim_) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = _softcap(logits, cfg.attn_logit_softcap) + mask
    return jax.nn.softmax(logits, axis=-1)


def attention_chunked(q, k, v, cfg: ModelConfig, layer: int,
                      q_chunk: int = 512, k_chunk: int = 1024):
    """Flash-style online-softmax attention with Gemma scale / softcap /
    sliding window (llama.attention_chunked with the Gemma logit path)."""
    b, s, h, d = q.shape
    qc, kc = min(q_chunk, s), min(k_chunk, s)
    pad_q, pad_k = (-s) % qc, (-s) % kc
    scale = (cfg.query_pre_attn_scalar or cfg.head_dim_) ** -0.5
    cap = cfg.attn_logit_softcap
    window = (cfg.sliding_window
              if cfg.sliding_window is not None and layer % 2 == 0 else None)
    qp = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    kp_ = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    vp_ = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    nq, nk = (s + pad_q) // qc, (s + pad_k) // kc
    qb = jnp.moveaxis(qp.reshape(b, nq, qc, h, d), 1, 0)

    def q_block(carry, inp):
        qi, qblk = inp
        qf = qblk.astype(jnp.float32) * scale

        def k_block(j, st):
            m, l, acc = st
            kblk = jax.lax.dynamic_slice(
                kp_, (0, j * kc, 0, 0), (b, kc, h, d)).astype(jnp.float32)
            vblk = jax.lax.dynamic_slice(
                vp_, (0, j * kc, 0, 0), (b, kc, h, d)).astype(jnp.float32)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kblk)
            logits = _softcap(logits, cap)
            qpos = qi * qc + jnp.arange(qc)[None, None, :, None]
            kpos = j * kc + jnp.arange(kc)[None, None, None, :]
            ok = (kpos <= qpos) & (kpos < s)
            if window is not None:
                ok = ok & (qpos - kpos < window)
            logits = jnp.where(ok, logits, jnp.finfo(jnp.float32).min)
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
        m1, l1, a1 = jax.lax.fori_loop(0, jnp.minimum(
            (qi * qc + qc + kc - 1) // kc, nk), k_block, (m0, l0, a0))
        out = a1 / jnp.maximum(l1[..., None], 1e-30)
        return carry, jnp.moveaxis(out, 1, 2)

    _, outs = jax.lax.scan(q_block, None, (jnp.arange(nq), qb))
    out = jnp.moveaxis(outs, 0, 1).reshape(b, nq * qc, h, d)
    return out[:, :s].astype(v.dtype)


def attention(q, k, v, cfg: ModelConfig, layer: int, mask=None,
              chunk_threshold: int = 2048):
    s = q.shape[1]
    if mask is None and s >= chunk_threshold:
        return attention_chunked(q, k, v, cfg, layer)
    if mask is None:
        mask = _mask_for_layer(s, layer, cfg)
    probs = attention_scores(q, k, mask, cfg)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def attn_block(lp, h, cos, sin, cfg: ModelConfig, policy: QuantPolicy,
               layer: int, mask=None, return_probs: bool = False):
    b, s, _ = h.shape
    hd, nq, nkv = cfg.head_dim_, cfg.num_attention_heads, cfg.num_key_value_heads

    q = M.linear(h, lp["q"], policy.a).reshape(b, s, nq, hd)
    k = M.linear(h, lp["k"], policy.a).reshape(b, s, nkv, hd)
    v = M.linear(h, lp["v"], policy.a)
    v = act_fake_quant(v, policy.v).reshape(b, s, nkv, hd)

    q = M.apply_rope(q, cos, sin)
    k = M.apply_rope(k, cos, sin)

    if policy.k.enabled:
        dt = jnp.float32 if policy.fp32_had else None
        q = hadamard_transform_last(q, dtype=dt)
        k = hadamard_transform_last(k, dtype=dt)
        k = M._k_fake_quant(k, policy.k, cfg.hidden_size)

    k = M.repeat_kv(k, nq // nkv)
    v = M.repeat_kv(v, nq // nkv)

    probs = None
    if return_probs:
        if mask is None:
            mask = _mask_for_layer(s, layer, cfg)
        probs = attention_scores(q, k, mask, cfg)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                          preferred_element_type=jnp.float32).astype(v.dtype)
    else:
        attn = attention(q, k, v, cfg, layer, mask)

    attn = attn.reshape(b, s, nq * hd)
    if policy.online_had_o:
        dt = jnp.float32 if policy.fp32_had else None
        attn = head_mixing_hadamard(attn, head_dim=hd, dtype=dt)
    out = M.linear(attn, lp["o"], policy.a)
    return out, probs


def mlp_block(lp, h, policy: QuantPolicy):
    up = M.linear(h, lp["up"], policy.a)
    gate = M.linear(h, lp["gate"], policy.a)
    act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True)
    act = act.astype(h.dtype) * up
    if policy.online_had_down:
        dt = jnp.float32 if policy.fp32_had else None
        act = matmul_hadU(act, dtype=dt)
    return M.linear(act, lp["down"], policy.a_down_)


def layer_forward(lp, x, cos, sin, cfg: ModelConfig, policy: QuantPolicy,
                  mask=None, return_probs: bool = False, layer: int = 0):
    """One Gemma-2 layer: the post-norms act on sub-block OUTPUTS."""
    h = rms_norm(x, lp.get("input_norm"), cfg.rms_norm_eps)
    attn_out, probs = attn_block(lp, h, cos, sin, cfg, policy, layer, mask,
                                 return_probs)
    x = x + rms_norm(attn_out, lp.get("post_attn_norm"), cfg.rms_norm_eps)
    h2 = rms_norm(x, lp.get("pre_ff_norm"), cfg.rms_norm_eps)
    mlp_out = mlp_block(lp, h2, policy)
    x = x + rms_norm(mlp_out, lp.get("post_ff_norm"), cfg.rms_norm_eps)
    if return_probs:
        return x, probs
    return x


def group_input(lp, x, cos, sin, cfg: ModelConfig, policy: QuantPolicy,
                group: tuple[str, ...], mask=None, layer: int = 0):
    """Activation feeding `group`'s linears (quantize/pipeline capture
    points; post-online-Hadamard, pre-act-quant — gptq_utils.py:496)."""
    h = rms_norm(x, lp.get("input_norm"), cfg.rms_norm_eps)
    if group == ("q", "k", "v"):
        return h
    b, s, _ = x.shape
    hd, nq, nkv = cfg.head_dim_, cfg.num_attention_heads, cfg.num_key_value_heads
    q = M.linear(h, lp["q"]).reshape(b, s, nq, hd)
    k = M.linear(h, lp["k"]).reshape(b, s, nkv, hd)
    v = M.linear(h, lp["v"]).reshape(b, s, nkv, hd)
    q = M.apply_rope(q, cos, sin)
    k = M.apply_rope(k, cos, sin)
    k = M.repeat_kv(k, nq // nkv)
    v = M.repeat_kv(v, nq // nkv)
    attn = attention(q, k, v, cfg, layer, mask).reshape(b, s, nq * hd)
    if policy.online_had_o:
        attn = head_mixing_hadamard(
            attn, head_dim=hd, dtype=jnp.float32 if policy.fp32_had else None)
    if group == ("o",):
        return attn
    x2 = x + rms_norm(M.linear(attn, lp["o"]), lp.get("post_attn_norm"),
                      cfg.rms_norm_eps)
    h2 = rms_norm(x2, lp.get("pre_ff_norm"), cfg.rms_norm_eps)
    if group == ("up", "gate"):
        return h2
    up = M.linear(h2, lp["up"])
    gate = M.linear(h2, lp["gate"])
    act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True)
    act = act.astype(h2.dtype) * up
    if policy.online_had_down:
        act = matmul_hadU(
            act, dtype=jnp.float32 if policy.fp32_had else None)
    assert group == ("down",)
    return act


def embed(params, input_ids, cfg: ModelConfig):
    """Token embeddings scaled by sqrt(hidden) (Gemma normalizer)."""
    x = params["embed"][input_ids]
    return x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)


def head(params, x, cfg: ModelConfig):
    x = rms_norm(x, params.get("final_norm"), cfg.rms_norm_eps)
    logits = x @ params["lm_head"].astype(x.dtype)
    return _softcap(logits.astype(jnp.float32),
                    cfg.final_logit_softcap).astype(logits.dtype)


@partial(jax.jit, static_argnames=("cfg", "policy"))
def forward(params, input_ids, cfg: ModelConfig, policy: QuantPolicy):
    b, s = input_ids.shape
    x = embed(params, input_ids, cfg)
    cos, sin = M.rope_tables(cfg, jnp.arange(s))
    for i, lp in enumerate(params["layers"]):
        x = layer_forward(lp, x, cos, sin, cfg, policy, mask=None, layer=i)
    return head(params, x, cfg)


def init_params(cfg: ModelConfig, key=None, dtype=jnp.float32, scale=0.02):
    key = key if key is not None else jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 64 + cfg.num_layers * 16))

    def w(shape):
        return (jax.random.normal(next(ks), shape) * scale).astype(dtype)

    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    qd, kvd = cfg.q_dim, cfg.kv_dim

    def lin(in_d, out_d):
        return {"w": w((in_d, out_d)), "b": None}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "input_norm": jnp.zeros((d,), dtype),
            "post_attn_norm": jnp.zeros((d,), dtype),
            "pre_ff_norm": jnp.zeros((d,), dtype),
            "post_ff_norm": jnp.zeros((d,), dtype),
            "q": lin(d, qd), "k": lin(d, kvd), "v": lin(d, kvd),
            "o": lin(qd, d),
            "up": lin(d, f), "gate": lin(d, f), "down": lin(f, d),
        })
    emb = w((v, d))
    return {
        "embed": emb,
        "layers": layers,
        "final_norm": jnp.zeros((d,), dtype),
        "lm_head": emb.T,  # always tied
    }
