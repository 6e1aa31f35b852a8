"""Functional Falcon-family decoder (parallel-attention architecture).

The reference registers Falcon in its model registry
(fake_quant/model_utils.py:18-19 FALCON_TYPES, :40) and targets
FalconLinear in its quantizer wrapping (quant_utils.py:469); SURVEY §7.4
deferred it — this closes that gap.  Architectural differences from the
Llama family, all data-driven here:

  - PARALLEL residual: one LayerNorm'd input feeds BOTH attention and the
    MLP, and the layer output is `x + attn(h) + mlp(h)` (falcon-7b,
    config.parallel_attn).  The 40B/180B "new decoder architecture" uses
    two norms (ln_attn / ln_mlp) in the same parallel topology — here
    that's just `post_norm is not None`;
  - LayerNorm (weight + bias) instead of RMSNorm — after QuaRot fusion both
    norms become the weightless RMSN because embeddings are mean-centered
    and mean-subtraction is baked into o/fc2 (same contract as OPT,
    rotation_utils.bake_mean_into_linear :29-43);
  - rotary position embeddings (HF rotate-half layout, like Llama);
  - MQA on falcon-7b (num_key_value_heads == 1) / GQA on 40B — both via
    repeat_kv;
  - two-linear GELU MLP: fc1 -> gelu -> fc2; linears carry no bias.

Param pytree schema:
  {"embed": (V, d),
   "layers": [{"input_norm": {"w","b"}|None, "post_norm": {"w","b"}|None,
               "q","k","v","o","fc1","fc2": {"w": (in,out), "b": None}},
              ...],
   "final_norm": {"w","b"}|None,
   "lm_head": (d, V), ["lm_head_bias": (V,)]}

`post_norm is None` in the UNFUSED model means falcon-7b's shared-LN
variant (the MLP reads the attention's normalized input); after fusion
both variants have `input_norm = post_norm = None` and the shared-vs-split
distinction is baked into fc1's weights.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rsq_tpu.core.hadamard import hadamard_transform_last, matmul_hadU
from rsq_tpu.core.quant import act_fake_quant
from rsq_tpu.models import llama as M
from rsq_tpu.models import opt as O
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import QuantPolicy

LINEAR_NAMES = ("q", "k", "v", "o", "fc1", "fc2")
GROUPS = (("q", "k", "v"), ("o",), ("fc1",), ("fc2",))


def _mlp_input(lp, x, h_attn, cfg: ModelConfig):
    """The MLP's normalized input: falcon-7b shares the attention's LN
    output; the new-decoder-architecture has its own ln_mlp. After fusion
    (norms None) both reduce to the weightless RMSN of x — identical to
    h_attn — so the shared path is used."""
    if lp.get("post_norm") is None:
        return h_attn
    return O.layer_norm(x, lp["post_norm"], cfg.rms_norm_eps)


def attn_block(lp, h, cos, sin, cfg: ModelConfig, policy: QuantPolicy,
               mask=None, return_probs: bool = False):
    """Self-attention on normalized input h (rotary + MQA/GQA)."""
    b, s, _ = h.shape
    hd, nq, nkv = (cfg.head_dim_, cfg.num_attention_heads,
                   cfg.num_key_value_heads)

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
            mask = M.causal_mask(s)
        probs = M.attention_scores(q, k, mask)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                          preferred_element_type=jnp.float32).astype(v.dtype)
    else:
        attn = M.attention(q, k, v, mask)

    attn = attn.reshape(b, s, nq * hd)
    # NB: no online o-side Hadamard for Falcon — 71 heads admit no
    # head-mixing Hadamard, so the v/o pair is baked fully offline
    # (rotation._had_out_per_head + _had_in_per_head); the o input is
    # already per-head rotated by construction.
    return M.linear(attn, lp["o"], policy.a), probs


def mlp_block(lp, h, policy: QuantPolicy):
    act = M.linear(h, lp["fc1"], policy.a)
    act = jax.nn.gelu(act.astype(jnp.float32), approximate=False).astype(h.dtype)
    if policy.online_had_down:
        dt = jnp.float32 if policy.fp32_had else None
        act = matmul_hadU(act, dtype=dt)
    return M.linear(act, lp["fc2"], policy.a_down_)


def layer_forward(lp, x, cos, sin, cfg: ModelConfig, policy: QuantPolicy,
                  mask=None, return_probs: bool = False, layer: int = 0):
    """One parallel decoder layer: x + attn(LN(x)) + mlp(LN'(x))."""
    h = O.layer_norm(x, lp.get("input_norm"), cfg.rms_norm_eps)
    attn_out, probs = attn_block(lp, h, cos, sin, cfg, policy, mask,
                                 return_probs)
    h_mlp = _mlp_input(lp, x, h, cfg)
    x = x + attn_out + mlp_block(lp, h_mlp, policy)
    if return_probs:
        return x, probs
    return x


def group_input(lp, x, cos, sin, cfg: ModelConfig, policy: QuantPolicy,
                group: tuple[str, ...], mask=None, layer: int = 0):
    """Activation feeding `group`'s linears (pipeline capture points).
    The parallel topology makes fc1's input independent of the attention
    path — q/k/v and fc1 share h when post_norm is None."""
    h = O.layer_norm(x, lp.get("input_norm"), cfg.rms_norm_eps)
    if group == ("q", "k", "v"):
        return h
    if group == ("fc1",):
        return _mlp_input(lp, x, h, cfg)
    if group == ("o",):
        b, s, _ = x.shape
        hd, nq, nkv = (cfg.head_dim_, cfg.num_attention_heads,
                       cfg.num_key_value_heads)
        q = M.linear(h, lp["q"]).reshape(b, s, nq, hd)
        k = M.linear(h, lp["k"]).reshape(b, s, nkv, hd)
        v = M.linear(h, lp["v"]).reshape(b, s, nkv, hd)
        q = M.apply_rope(q, cos, sin)
        k = M.apply_rope(k, cos, sin)
        k = M.repeat_kv(k, nq // nkv)
        v = M.repeat_kv(v, nq // nkv)
        # no online o-side Hadamard (see attn_block): the capture point is
        # the raw attention output, whose per-head rotation is offline
        return M.attention(q, k, v, mask).reshape(b, s, nq * hd)
    assert group == ("fc2",)
    h_mlp = _mlp_input(lp, x, h, cfg)
    act = M.linear(h_mlp, lp["fc1"])
    act = jax.nn.gelu(act.astype(jnp.float32),
                      approximate=False).astype(x.dtype)
    if policy.online_had_down:
        act = matmul_hadU(act, dtype=jnp.float32 if policy.fp32_had else None)
    return act


def embed(params, input_ids, cfg: ModelConfig | None = None):
    return params["embed"][input_ids]


def head(params, x, cfg: ModelConfig):
    x = O.layer_norm(x, params.get("final_norm"), cfg.rms_norm_eps)
    logits = x @ params["lm_head"].astype(x.dtype)
    if params.get("lm_head_bias") is not None:  # fused final-LN bias
        logits = logits + params["lm_head_bias"].astype(logits.dtype)
    return logits


@partial(jax.jit, static_argnames=("cfg", "policy"))
def forward(params, input_ids, cfg: ModelConfig, policy: QuantPolicy):
    b, s = input_ids.shape
    x = embed(params, input_ids)
    cos, sin = M.rope_tables(cfg, jnp.arange(s))
    for lp in params["layers"]:
        x = layer_forward(lp, x, cos, sin, cfg, policy, mask=None)
    return head(params, x, cfg)


def init_params(cfg: ModelConfig, key=None, dtype=jnp.float32, scale=0.02):
    key = key if key is not None else jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 64 + cfg.num_layers * 16))

    def w(shape):
        return (jax.random.normal(next(ks), shape) * scale).astype(dtype)

    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def lin(in_d, out_d):
        return {"w": w((in_d, out_d)), "b": None}

    def norm():
        return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "input_norm": norm(),
            # falcon-7b topology: MLP shares the attention LN output
            "post_norm": norm() if cfg.falcon_two_norms else None,
            "q": lin(d, cfg.q_dim), "k": lin(d, cfg.kv_dim),
            "v": lin(d, cfg.kv_dim), "o": lin(cfg.q_dim, d),
            "fc1": lin(d, f), "fc2": lin(f, d),
        })
    emb = w((v, d))
    return {
        "embed": emb,
        "layers": layers,
        "final_norm": norm(),
        "lm_head": emb.T if cfg.tie_word_embeddings else w((d, v)),
    }
