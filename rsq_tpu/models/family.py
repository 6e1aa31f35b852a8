"""Family dispatch: one call surface over the Llama-family, OPT and Gemma-2
decoders.

The reference threads `model_type` through every helper
(fake_quant/model_utils.py:112-181); here the family is a static field of
the (hashable, frozen) ModelConfig, so dispatch happens at trace time and
jitted callers specialize per family for free.  `layer` threads the layer
index to families whose forward depends on it (Gemma-2's alternating
sliding-window attention); Llama/OPT ignore it.
"""

from __future__ import annotations

import jax.numpy as jnp

from rsq_tpu.models import falcon, gemma2, llama, opt
from rsq_tpu.models.config import ModelConfig


def module_for(cfg: ModelConfig):
    if cfg.family == "opt":
        return opt
    if cfg.family == "gemma2":
        return gemma2
    if cfg.family == "falcon":
        return falcon
    return llama


def groups_for(cfg: ModelConfig) -> tuple[tuple[str, ...], ...]:
    """Sequential projection groups for layer-wise quantization
    (gptq_utils.py:480-485; OPT: qkv / out / fc1 / fc2)."""
    if cfg.family == "opt":
        return opt.GROUPS
    if cfg.family == "falcon":
        return falcon.GROUPS
    return (("q", "k", "v"), ("o",), ("up", "gate"), ("down",))


def linear_names(cfg: ModelConfig) -> tuple[str, ...]:
    return module_for(cfg).LINEAR_NAMES


def pos_tables(cfg: ModelConfig, positions):
    """RoPE cos/sin tables, or (None, None) for learned-position families."""
    if cfg.family == "opt":
        return None, None
    return llama.rope_tables(cfg, positions)


def embed(params, input_ids, cfg: ModelConfig):
    if cfg.family == "opt":
        return opt.embed(params, input_ids, cfg)
    if cfg.family == "gemma2":
        return gemma2.embed(params, input_ids, cfg)
    return llama.embed(params, input_ids)  # falcon shares llama's embed


def layer_forward(lp, x, cos, sin, cfg: ModelConfig, policy, mask=None,
                  return_probs: bool = False, layer: int = 0):
    return module_for(cfg).layer_forward(lp, x, cos, sin, cfg, policy,
                                         mask, return_probs, layer=layer)


def group_input(lp, x, cos, sin, cfg: ModelConfig, policy, group, mask=None,
                layer: int = 0):
    if cfg.family == "opt":
        return opt.group_input(lp, x, cos, sin, cfg, policy, group, mask,
                               layer=layer)
    if cfg.family == "falcon":
        return falcon.group_input(lp, x, cos, sin, cfg, policy, group, mask,
                                  layer=layer)
    if cfg.family == "gemma2":
        return gemma2.group_input(lp, x, cos, sin, cfg, policy, group, mask,
                                  layer=layer)
    from rsq_tpu.quantize.pipeline import group_input as llama_group_input
    return llama_group_input(lp, x, cos, sin, cfg, policy, group, mask,
                             layer=layer)


def head(params, x, cfg: ModelConfig):
    return module_for(cfg).head(params, x, cfg)


def forward(params, input_ids, cfg: ModelConfig, policy):
    return module_for(cfg).forward(params, input_ids, cfg, policy)


def init_params(cfg: ModelConfig, key=None, dtype=jnp.float32, scale=0.02):
    return module_for(cfg).init_params(cfg, key, dtype=dtype, scale=scale)
