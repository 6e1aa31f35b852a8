"""Functional OPT-family decoder (the reference's debug family).

The reference supports OPT throughout its per-family accessors
(fake_quant/model_utils.py:8-31, 119-181) and rotation engine
(rotation_utils.py:64-72, 146-252); opt-125m is its designated debug model
(utils.py:279-280).  Architectural differences from the Llama family, all
data-driven here:

  - learned positional embeddings with the HF offset of 2, added at embed
    time (no RoPE);
  - LayerNorm (weight + bias) instead of RMSNorm — after QuaRot fusion the
    norm becomes the same weightless RMSN as Llama's because embeddings are
    mean-centered and mean-subtraction is baked into out_proj/fc2
    (rotation_utils.bake_mean_into_linear :29-43);
  - biased q/k/v/o projections, MHA (kv heads == heads);
  - two-linear ReLU MLP: fc1 -> relu -> fc2.

Param pytree schema:
  {"embed": (V, d), "embed_pos": (P + 2, d),
   "layers": [{"input_norm": {"w","b"}|None, "post_norm": {"w","b"}|None,
               "q","k","v","o","fc1","fc2": {"w": (in,out), "b": (out,)}},
              ...],
   "final_norm": {"w","b"}|None,
   "lm_head": (d, V)}

Quantization policy semantics (act quant at every linear input, online
Hadamards on o/fc2 when rotated, post-"rope" K quant) mirror models/llama.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rsq_tpu.core.hadamard import (
    hadamard_transform_last, head_mixing_hadamard, matmul_hadU)
from rsq_tpu.core.quant import act_fake_quant
from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import QuantPolicy

LINEAR_NAMES = ("q", "k", "v", "o", "fc1", "fc2")
GROUPS = (("q", "k", "v"), ("o",), ("fc1",), ("fc2",))
POS_OFFSET = 2  # HF OPTLearnedPositionalEmbedding offset


def layer_norm(x, p, eps):
    """LayerNorm with affine params p={"w","b"}; p=None means the fused
    weightless RMSN (the reference swaps LayerNorm for RMSN after baking the
    mean path into adjacent linears, rotation_utils.py:80-90)."""
    if p is None:
        return M.rms_norm(x, None, eps)
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    return xf.astype(dtype)


def embed(params, input_ids, cfg: ModelConfig | None = None):
    """Token + learned positional embeddings (positions 0..s-1, offset 2)."""
    s = input_ids.shape[-1]
    pos = jnp.arange(s) + POS_OFFSET
    return params["embed"][input_ids] + params["embed_pos"][pos]


def attn_block(lp, h, cfg: ModelConfig, policy: QuantPolicy, mask=None,
               return_probs: bool = False):
    b, s, _ = h.shape
    hd, nq = cfg.head_dim_, cfg.num_attention_heads

    q = M.linear(h, lp["q"], policy.a).reshape(b, s, nq, hd)
    k = M.linear(h, lp["k"], policy.a).reshape(b, s, nq, hd)
    v = M.linear(h, lp["v"], policy.a)
    v = act_fake_quant(v, policy.v).reshape(b, s, nq, hd)

    if policy.k.enabled:
        dt = jnp.float32 if policy.fp32_had else None
        q = hadamard_transform_last(q, dtype=dt)
        k = hadamard_transform_last(k, dtype=dt)
        k = M._k_fake_quant(k, policy.k, cfg.hidden_size)

    probs = None
    if return_probs:
        if mask is None:
            mask = M.causal_mask(s)
        probs = M.attention_scores(q, k, mask)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                          preferred_element_type=jnp.float32).astype(v.dtype)
    else:
        attn = M.attention(q, k, v, mask)

    attn = attn.reshape(b, s, nq * hd)
    if policy.online_had_o:
        dt = jnp.float32 if policy.fp32_had else None
        attn = head_mixing_hadamard(attn, head_dim=hd, dtype=dt)
    out = M.linear(attn, lp["o"], policy.a)
    return out, probs


def mlp_block(lp, h, policy: QuantPolicy):
    act = M.linear(h, lp["fc1"], policy.a)
    act = jax.nn.relu(act)
    if policy.online_had_down:
        dt = jnp.float32 if policy.fp32_had else None
        act = matmul_hadU(act, dtype=dt)
    return M.linear(act, lp["fc2"], policy.a_down_)


def layer_forward(lp, x, cos, sin, cfg: ModelConfig, policy: QuantPolicy,
                  mask=None, return_probs: bool = False, layer: int = 0):
    """One decoder layer (cos/sin/layer accepted for signature parity)."""
    h = layer_norm(x, lp.get("input_norm"), cfg.rms_norm_eps)
    attn_out, probs = attn_block(lp, h, cfg, policy, mask, return_probs)
    x = x + attn_out
    h2 = layer_norm(x, lp.get("post_norm"), cfg.rms_norm_eps)
    x = x + mlp_block(lp, h2, policy)
    if return_probs:
        return x, probs
    return x


def group_input(lp, x, cos, sin, cfg: ModelConfig, policy: QuantPolicy,
                group: tuple[str, ...], mask=None, layer: int = 0):
    """Activation feeding `group`'s linears (pipeline capture points, after
    online Hadamards; see quantize/pipeline.group_input)."""
    h = layer_norm(x, lp.get("input_norm"), cfg.rms_norm_eps)
    if group == ("q", "k", "v"):
        return h
    b, s, _ = x.shape
    hd, nq = cfg.head_dim_, cfg.num_attention_heads
    q = M.linear(h, lp["q"]).reshape(b, s, nq, hd)
    k = M.linear(h, lp["k"]).reshape(b, s, nq, hd)
    v = M.linear(h, lp["v"]).reshape(b, s, nq, hd)
    attn = M.attention(q, k, v, mask).reshape(b, s, nq * hd)
    if policy.online_had_o:
        attn = head_mixing_hadamard(
            attn, head_dim=hd, dtype=jnp.float32 if policy.fp32_had else None)
    if group == ("o",):
        return attn
    x2 = x + M.linear(attn, lp["o"])
    h2 = layer_norm(x2, lp.get("post_norm"), cfg.rms_norm_eps)
    if group == ("fc1",):
        return h2
    act = jax.nn.relu(M.linear(h2, lp["fc1"]))
    if policy.online_had_down:
        act = matmul_hadU(
            act, dtype=jnp.float32 if policy.fp32_had else None)
    assert group == ("fc2",)
    return act


def head(params, x, cfg: ModelConfig):
    x = layer_norm(x, params.get("final_norm"), cfg.rms_norm_eps)
    logits = x @ params["lm_head"].astype(x.dtype)
    if params.get("lm_head_bias") is not None:  # fused final-LN bias
        logits = logits + params["lm_head_bias"].astype(logits.dtype)
    return logits


@partial(jax.jit, static_argnames=("cfg", "policy"))
def forward(params, input_ids, cfg: ModelConfig, policy: QuantPolicy):
    x = embed(params, input_ids)
    for lp in params["layers"]:
        x = layer_forward(lp, x, None, None, cfg, policy, mask=None)
    return head(params, x, cfg)


def init_params(cfg: ModelConfig, key=None, dtype=jnp.float32, scale=0.02):
    key = key if key is not None else jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 64 + cfg.num_layers * 16))

    def w(shape):
        return (jax.random.normal(next(ks), shape) * scale).astype(dtype)

    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def lin(in_d, out_d):
        return {"w": w((in_d, out_d)), "b": jnp.zeros((out_d,), dtype)}

    def norm():
        return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "input_norm": norm(), "post_norm": norm(),
            "q": lin(d, d), "k": lin(d, d), "v": lin(d, d), "o": lin(d, d),
            "fc1": lin(d, f), "fc2": lin(f, d),
        })
    emb = w((v, d))
    return {
        "embed": emb,
        "embed_pos": w((cfg.max_position_embeddings + POS_OFFSET, d)),
        "layers": layers,
        "final_norm": norm(),
        "lm_head": emb.T if cfg.tie_word_embeddings else w((d, v)),
    }
