"""HuggingFace checkpoint ingest: torch state dict -> rsq_tpu pytree.

Counterpart of the reference's `model_utils.get_model` (which keeps the HF
torch module and mutates it); here the HF checkpoint is a one-way import on
the host, after which everything is JAX.  Weights are transposed to the
(in, out) layout used by models/llama.py.

torch is only imported inside these functions so the rest of the framework
has no torch dependency.
"""

from __future__ import annotations

import numpy as np

from rsq_tpu.models.config import ModelConfig, RopeScaling

_LAYER_KEYS = {
    "q": "self_attn.q_proj",
    "k": "self_attn.k_proj",
    "v": "self_attn.v_proj",
    "o": "self_attn.o_proj",
    "up": "mlp.up_proj",
    "gate": "mlp.gate_proj",
    "down": "mlp.down_proj",
}


def config_from_hf(hf_config) -> ModelConfig:
    """Map a transformers config (Llama/Qwen2/Mistral/OPT) onto ModelConfig."""
    family = {"llama": "llama", "qwen2": "qwen2", "mistral": "mistral",
              "opt": "opt", "gemma2": "gemma2", "falcon": "falcon"}.get(
                  hf_config.model_type, "llama")
    if family == "falcon":
        assert getattr(hf_config, "parallel_attn", True), \
            "sequential-residual Falcon variants (falcon-rw) not supported"
        new_arch = getattr(hf_config, "new_decoder_architecture", False)
        nq = hf_config.num_attention_heads
        nkv = (hf_config.num_kv_heads if new_arch
               else (1 if hf_config.multi_query else nq))
        return ModelConfig(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=getattr(hf_config, "ffn_hidden_size",
                                      4 * hf_config.hidden_size),
            num_layers=hf_config.num_hidden_layers,
            num_attention_heads=nq,
            num_key_value_heads=nkv,
            head_dim=hf_config.hidden_size // nq,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rms_norm_eps=hf_config.layer_norm_epsilon,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                        True),
            max_position_embeddings=getattr(
                hf_config, "max_position_embeddings", 2048),
            family="falcon", falcon_two_norms=new_arch)
    if family == "gemma2":
        return ModelConfig(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            num_key_value_heads=hf_config.num_key_value_heads,
            head_dim=hf_config.head_dim,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rms_norm_eps=hf_config.rms_norm_eps,
            tie_word_embeddings=True,
            max_position_embeddings=hf_config.max_position_embeddings,
            family="gemma2",
            query_pre_attn_scalar=float(hf_config.query_pre_attn_scalar),
            attn_logit_softcap=hf_config.attn_logit_softcapping,
            final_logit_softcap=hf_config.final_logit_softcapping,
            sliding_window=hf_config.sliding_window)
    if family == "opt":
        assert getattr(hf_config, "do_layer_norm_before", True), \
            "pre-LN OPT variants only (opt-350m is post-LN)"
        assert hf_config.word_embed_proj_dim == hf_config.hidden_size, \
            "OPT word_embed_proj_dim != hidden_size not supported"
        return ModelConfig(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.ffn_dim,
            num_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            num_key_value_heads=hf_config.num_attention_heads,
            rms_norm_eps=1e-5, attention_bias=True,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", True),
            max_position_embeddings=hf_config.max_position_embeddings,
            family="opt")
    scaling = None
    rs = getattr(hf_config, "rope_scaling", None)
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        scaling = RopeScaling(
            factor=rs["factor"],
            low_freq_factor=rs["low_freq_factor"],
            high_freq_factor=rs["high_freq_factor"],
            original_max_position_embeddings=rs["original_max_position_embeddings"])
    return ModelConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        num_key_value_heads=getattr(hf_config, "num_key_value_heads",
                                    hf_config.num_attention_heads),
        head_dim=getattr(hf_config, "head_dim", None),
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rope_scaling=scaling,
        rms_norm_eps=hf_config.rms_norm_eps,
        attention_bias=getattr(hf_config, "attention_bias",
                               family == "qwen2"),
        tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        max_position_embeddings=hf_config.max_position_embeddings,
        family=family)


def params_from_state_dict(sd, cfg: ModelConfig, dtype=np.float32):
    """Convert an HF state dict (torch tensors or numpy arrays) into the
    rsq_tpu param pytree (numpy host arrays; callers device_put as needed)."""
    import jax.numpy as jnp

    def get(name):
        t = sd[name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t, dtype=dtype)

    def lin(prefix):
        p = {"w": jnp.asarray(get(prefix + ".weight").T)}
        p["b"] = (jnp.asarray(get(prefix + ".bias"))
                  if prefix + ".bias" in sd else None)
        return p

    if cfg.family == "opt":
        return _opt_params_from_state_dict(sd, cfg, get, lin)
    if cfg.family == "falcon":
        return _falcon_params_from_state_dict(sd, cfg, get)
    if cfg.family == "gemma2":
        return _gemma2_params_from_state_dict(sd, cfg, get, lin)

    layers = []
    for i in range(cfg.num_layers):
        base = f"model.layers.{i}."
        lp = {name: lin(base + hf_name) for name, hf_name in _LAYER_KEYS.items()}
        lp["input_norm"] = jnp.asarray(get(base + "input_layernorm.weight"))
        lp["post_norm"] = jnp.asarray(get(base + "post_attention_layernorm.weight"))
        layers.append(lp)

    embed = get("model.embed_tokens.weight")
    if cfg.tie_word_embeddings or "lm_head.weight" not in sd:
        lm_head = embed.T.copy()
    else:
        lm_head = get("lm_head.weight").T
    return {
        "embed": jnp.asarray(embed),
        "layers": layers,
        "final_norm": jnp.asarray(get("model.norm.weight")),
        "lm_head": jnp.asarray(lm_head),
    }


_OPT_LAYER_KEYS = {
    "q": "self_attn.q_proj",
    "k": "self_attn.k_proj",
    "v": "self_attn.v_proj",
    "o": "self_attn.out_proj",
    "fc1": "fc1",
    "fc2": "fc2",
}


def _opt_params_from_state_dict(sd, cfg, get, lin):
    import jax.numpy as jnp

    def norm(prefix):
        return {"w": jnp.asarray(get(prefix + ".weight")),
                "b": jnp.asarray(get(prefix + ".bias"))}

    layers = []
    for i in range(cfg.num_layers):
        base = f"model.decoder.layers.{i}."
        lp = {name: lin(base + hf_name)
              for name, hf_name in _OPT_LAYER_KEYS.items()}
        lp["input_norm"] = norm(base + "self_attn_layer_norm")
        lp["post_norm"] = norm(base + "final_layer_norm")
        layers.append(lp)

    embed = get("model.decoder.embed_tokens.weight")
    if cfg.tie_word_embeddings or "lm_head.weight" not in sd:
        lm_head = embed.T.copy()
    else:
        lm_head = get("lm_head.weight").T
    return {
        "embed": jnp.asarray(embed),
        "embed_pos": jnp.asarray(get("model.decoder.embed_positions.weight")),
        "layers": layers,
        "final_norm": norm("model.decoder.final_layer_norm"),
        "lm_head": jnp.asarray(lm_head),
    }


def _split_falcon_qkv(W, cfg):
    """Split HF Falcon's fused query_key_value weight (torch (out, in)
    layout) into q/k/v in rsq_tpu's (in, out) layout.

    HF layouts (modeling_falcon._split_heads):
      - old arch, multi_query: rows = [nq q-heads..., k, v];
      - old arch, MHA: rows = per-head [q, k, v] interleaved;
      - new arch: rows = per kv-group [nq/nkv q-heads..., k, v]."""
    hd, nq, nkv = cfg.head_dim_, cfg.num_attention_heads, cfg.num_key_value_heads
    d = W.shape[1]
    if cfg.falcon_two_norms:  # new decoder architecture: grouped layout
        Wg = W.reshape(nkv, nq // nkv + 2, hd, d)
        q = Wg[:, :-2].reshape(nq * hd, d)
        k = Wg[:, -2].reshape(nkv * hd, d)
        v = Wg[:, -1].reshape(nkv * hd, d)
    elif nkv == 1:  # multi_query: all q heads first, then one k, one v
        q, k, v = W[:nq * hd], W[nq * hd:(nq + 1) * hd], W[(nq + 1) * hd:]
    else:  # MHA: (q, k, v) interleaved per head
        Wg = W.reshape(nq, 3, hd, d)
        q = Wg[:, 0].reshape(nq * hd, d)
        k = Wg[:, 1].reshape(nq * hd, d)
        v = Wg[:, 2].reshape(nq * hd, d)
    return q.T, k.T, v.T


def _falcon_params_from_state_dict(sd, cfg, get):
    import jax.numpy as jnp

    def norm(prefix):
        return {"w": jnp.asarray(get(prefix + ".weight")),
                "b": jnp.asarray(get(prefix + ".bias"))}

    def lin_nb(name):  # falcon linears carry no bias
        return {"w": jnp.asarray(get(name + ".weight").T), "b": None}

    layers = []
    for i in range(cfg.num_layers):
        base = f"transformer.h.{i}."
        q, k, v = _split_falcon_qkv(
            get(base + "self_attention.query_key_value.weight"), cfg)
        lp = {
            "q": {"w": jnp.asarray(q), "b": None},
            "k": {"w": jnp.asarray(k), "b": None},
            "v": {"w": jnp.asarray(v), "b": None},
            "o": lin_nb(base + "self_attention.dense"),
            "fc1": lin_nb(base + "mlp.dense_h_to_4h"),
            "fc2": lin_nb(base + "mlp.dense_4h_to_h"),
        }
        if cfg.falcon_two_norms:
            lp["input_norm"] = norm(base + "ln_attn")
            lp["post_norm"] = norm(base + "ln_mlp")
        else:
            lp["input_norm"] = norm(base + "input_layernorm")
            lp["post_norm"] = None
        layers.append(lp)

    embed = get("transformer.word_embeddings.weight")
    if cfg.tie_word_embeddings or "lm_head.weight" not in sd:
        lm_head = embed.T.copy()
    else:
        lm_head = get("lm_head.weight").T
    return {
        "embed": jnp.asarray(embed),
        "layers": layers,
        "final_norm": norm("transformer.ln_f"),
        "lm_head": jnp.asarray(lm_head),
    }


_GEMMA2_NORM_KEYS = {
    "input_norm": "input_layernorm",
    "post_attn_norm": "post_attention_layernorm",
    "pre_ff_norm": "pre_feedforward_layernorm",
    "post_ff_norm": "post_feedforward_layernorm",
}


def _gemma2_params_from_state_dict(sd, cfg, get, lin):
    import jax.numpy as jnp

    layers = []
    for i in range(cfg.num_layers):
        base = f"model.layers.{i}."
        lp = {name: lin(base + hf_name)
              for name, hf_name in _LAYER_KEYS.items()}
        for name, hf_name in _GEMMA2_NORM_KEYS.items():
            lp[name] = jnp.asarray(get(base + hf_name + ".weight"))
        layers.append(lp)

    embed = get("model.embed_tokens.weight")
    return {
        "embed": jnp.asarray(embed),
        "layers": layers,
        "final_norm": jnp.asarray(get("model.norm.weight")),
        "lm_head": jnp.asarray(embed.T.copy()),  # always tied
    }


def from_hf_model(model):
    """(torch transformers model) -> (ModelConfig, params pytree)."""
    cfg = config_from_hf(model.config)
    return cfg, params_from_state_dict(model.state_dict(), cfg)


def load_hf(path_or_name: str, dtype=np.float32):
    """Load an HF checkpoint from a local path (or hub when network exists)."""
    from transformers import AutoConfig, AutoModelForCausalLM
    import torch

    hf_config = AutoConfig.from_pretrained(path_or_name)
    model = AutoModelForCausalLM.from_pretrained(
        path_or_name, torch_dtype=torch.float32, low_cpu_mem_usage=True)
    cfg = config_from_hf(hf_config)
    return cfg, params_from_state_dict(model.state_dict(), cfg, dtype=dtype)
