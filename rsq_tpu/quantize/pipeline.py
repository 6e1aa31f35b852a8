"""The RSQ pipeline: rotate -> scale -> quantize, layer-streamed.

TPU-first re-design of `gptq_fwrd` (fake_quant/gptq_utils.py:447-681).  The
reference walks torch modules with forward hooks; here each decoder layer is
a pytree and the four projection groups' inputs are produced by explicit
sub-forward functions, so "capture" is just running a jitted function that
folds Hessian accumulation into the layer recompute — activations never
leave the device during a layer's quantization.

Group order matches the reference exactly (gptq_utils.py:480-485):
  {q,k,v} -> {o} -> {up,gate} -> {down},
with each group's Hessian computed after the previous groups' weights have
already been replaced by their quantized versions.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rsq_tpu.core.quant import WeightQuantConfig
from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import QuantPolicy
from rsq_tpu.quantize import rotation
from rsq_tpu.quantize.gptq import GPTQConfig, gptq_quantize, rtn_quantize
from rsq_tpu.quantize.weighting import (
    WeightingConfig, compute_sample_weight, token_frequencies)

logger = logging.getLogger(__name__)

GROUPS = (("q", "k", "v"), ("o",), ("up", "gate"), ("down",))


@dataclasses.dataclass(frozen=True)
class RSQConfig:
    """Everything `fake_quant/main.py` reads from argparse, typed."""
    w: WeightQuantConfig = WeightQuantConfig(bits=4, sym=True, mse=False)
    gptq: GPTQConfig = GPTQConfig()
    weighting: WeightingConfig | None = None
    rotate: bool = False
    rotate_mode: str = "hadamard"
    rotation_seed: int = 0
    w_rtn: bool = False
    e8p: bool = False
    nsamples: int = 128
    seed: int = 0
    # per-module overrides
    int8_down_proj: bool = False
    layers_dont_quantize: tuple[int, ...] = ()
    wbits_overrides: tuple[tuple[str, int], ...] = ()  # (name, bits)

    def bits_for(self, layer_idx: int, name: str) -> int:
        if layer_idx in self.layers_dont_quantize:
            return 16
        for n, b in self.wbits_overrides:
            if n == name:
                return b
        if self.int8_down_proj and name == "down":
            return 8
        return self.w.bits


# ---------------------------------------------------------------------------
# Sub-forward capture functions: inputs to each projection group
# ---------------------------------------------------------------------------

def group_input(lp, x, cos, sin, cfg: ModelConfig, policy: QuantPolicy,
                group: tuple[str, ...], mask=None, layer: int = 0):
    """The activation that feeds `group`'s linears, under current weights.

    Capture points sit AFTER the online Hadamards (the reference hooks the
    inner nn.Linear inside ActQuantWrapper, so online transforms are already
    applied to the captured input; gptq_utils.py:496, quant_utils.py:285-318).
    Activation quantizers are NOT yet active during calibration, matching
    main.py's ordering (a-bit config happens after gptq, main.py:107-138).
    """
    from rsq_tpu.core.hadamard import head_mixing_hadamard, matmul_hadU
    h = M.rms_norm(x, lp.get("input_norm"), cfg.rms_norm_eps)
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
    attn = M.attention(q, k, v, mask).reshape(b, s, nq * hd)
    if policy.online_had_o:
        attn = head_mixing_hadamard(
            attn, head_dim=hd, dtype=jnp.float32 if policy.fp32_had else None)
    if group == ("o",):
        return attn
    x2 = x + M.linear(attn, lp["o"])
    h2 = M.rms_norm(x2, lp.get("post_norm"), cfg.rms_norm_eps)
    if group == ("up", "gate"):
        return h2
    up = M.linear(h2, lp["up"])
    gate = M.linear(h2, lp["gate"])
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(h2.dtype) * up
    if policy.online_had_down:
        act = matmul_hadU(
            act, dtype=jnp.float32 if policy.fp32_had else None)
    assert group == ("down",)
    return act


@partial(jax.jit, static_argnames=("cfg", "policy", "group", "layer"))
def _hessian_accumulate(H, lp, x, w, cos, sin, cfg, policy, group, mask,
                        layer=0):
    """A chunk of samples' Hessian contribution for `group`, fused with the
    layer sub-forward. x: (C, L, d); w: (C, L) normalized token weights
    (zero rows = padding samples contribute nothing)."""
    from rsq_tpu.models import family
    if x.ndim == 2:
        x = x[None]
    if w.ndim == 1:
        w = w[None]
    inp = family.group_input(lp, x, cos, sin, cfg, policy, group, mask,
                             layer=layer)
    inp = inp.astype(jnp.float32) * jnp.sqrt(w)[:, :, None]
    return H + jnp.einsum("cld,cle->de", inp, inp,
                          preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("cfg", "policy", "layer"))
def _layer_out(lp, x, cos, sin, cfg, policy, mask, layer=0):
    from rsq_tpu.models import family
    return family.layer_forward(lp, x, cos, sin, cfg, policy, mask,
                                layer=layer)


@partial(jax.jit, static_argnames=("cfg", "policy", "wcfg", "layer"))
def _chunk_weights(lp, x, cos, sin, cfg, policy, mask, token_freq, wcfg,
                   layer=0):
    """Importance weights for a CHUNK of samples in one program: the layer
    forward (for `outs`) fused with a vmapped per-sample weighting pass.
    Replaces 2 dispatches per sample with 1 per chunk (the round-1
    dispatch-bound loop, pipeline.py:209-220). x: (C, L, d)."""
    from rsq_tpu.models import family
    outs = family.layer_forward(lp, x, cos, sin, cfg, policy, mask,
                                layer=layer)
    return jax.vmap(
        lambda xi, oi, tfi: compute_sample_weight(
            lp, xi, oi, tfi, cfg, policy, wcfg, layer=layer)
    )(x, outs, token_freq)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _calibration_policy(rsq: RSQConfig, cfg: ModelConfig) -> QuantPolicy:
    """Forward behavior during calibration: online Hadamards active when
    rotated; no activation quantizers yet.  The down/fc2 online Hadamard is
    gated on a construction existing for the intermediate size (falcon-7b's
    18176 has none; rotation.rotate skips the paired exact transform)."""
    from rsq_tpu.core.hadamard import hadU_supported
    return QuantPolicy(
        online_had_down=rsq.rotate and hadU_supported(cfg.intermediate_size),
        online_had_o=rsq.rotate, norms_fused=rsq.rotate)


def quantize_model(params, cfg: ModelConfig, rsq: RSQConfig, calib_ids,
                   eval_policy: QuantPolicy | None = None):
    """Run the full RSQ pipeline on a model.

    params: model pytree (will not be mutated); calib_ids: (N, L) int tokens.
    Returns (new_params, quantizers) where quantizers maps
    "layers.<i>.<name>" -> {scale, zero, bits}.
    """
    t_start = time.perf_counter()
    rng = np.random.default_rng(rsq.seed)

    if rsq.rotate:
        params, Q = rotation.rotate_model(
            params, cfg, mode=rsq.rotate_mode, seed=rsq.rotation_seed)
        logger.info("rotation applied (mode=%s)", rsq.rotate_mode)

    from rsq_tpu.models import family

    # layer-streamed memory contract (the reference's layer.to(dev)/.cpu()
    # pattern, gptq_utils.py:493-676): ALL weights park on host; each layer
    # is staged onto the device once at the top of its loop iteration and
    # the quantized result parks back.  Without this, rotation leaves the
    # full f32 model in HBM (embed+lm_head alone are 4.2 GB at 8B) and the
    # 14336-dim inverse-Cholesky chain has no room (measured OOM).
    _host = jax.devices("cpu")[0]
    _dev = jax.devices()[0]

    def _park(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, _host) if isinstance(a, jax.Array)
            else a, tree, is_leaf=lambda a: a is None)

    def _stage(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, _dev) if isinstance(a, jax.Array)
            else a, tree, is_leaf=lambda a: a is None)

    params = _park(params)

    calib_ids = np.asarray(calib_ids)[: rsq.nsamples]
    n, L = calib_ids.shape
    policy = _calibration_policy(rsq, cfg)
    cos, sin = family.pos_tables(cfg, jnp.arange(L))
    groups = family.groups_for(cfg)

    # calibration attention mask: custom attention, when configured, stays
    # enabled for the Hessian AND post-quant output passes (the reference
    # disables it only after the layer is done, gptq_utils.py:509-517,666-670).
    # None = plain causal -> the model picks flash-chunked attention for
    # long sequences instead of materializing (H, L, L).
    mask = None
    if rsq.weighting is not None and rsq.weighting.custom_attn_type not in (
            None, "topk"):
        from rsq_tpu.quantize.weighting import calibration_mask
        cmask = calibration_mask(rsq.weighting, L, cfg.num_attention_heads)
        mask = mask + cmask if cmask.ndim == 2 else cmask + M.causal_mask(L)
        mask = jnp.maximum(mask, jnp.finfo(jnp.float32).min)

    token_freq = np.asarray(token_frequencies(calib_ids))

    # first-layer inputs (get_inps, gptq_utils.py:320-428) — embeddings only
    # (for OPT this includes the learned positional embeddings, :352-357)
    inps = np.asarray(jax.jit(family.embed, static_argnames=("cfg",))(
        params, jnp.asarray(calib_ids), cfg=cfg))

    # sample shuffle (gptq_utils.py:490-491)
    perm = rng.permutation(n)
    inps = inps[perm]
    token_freq = token_freq[perm]

    quantizers = {}
    new_layers = []
    for i, lp in enumerate(params["layers"]):
        t_layer = time.perf_counter()
        lp = _stage(dict(lp))

        # per-sample importance weights for this layer (chunked + fused with
        # the outs forward: one dispatch per chunk, not two per sample)
        if rsq.weighting is not None:
            chunk = min(8, n)
            pad = (-n) % chunk
            inps_w = np.concatenate(
                [inps, np.zeros((pad, *inps.shape[1:]), inps.dtype)]) \
                if pad else inps
            tf_w = np.concatenate(
                [token_freq, np.zeros((pad, L), token_freq.dtype)]) \
                if pad else token_freq
            batch_w = np.concatenate([
                np.asarray(_chunk_weights(
                    lp, jnp.asarray(inps_w[j:j + chunk]), cos, sin, cfg,
                    policy, mask, jnp.asarray(tf_w[j:j + chunk]),
                    rsq.weighting, layer=i))
                for j in range(0, n + pad, chunk)])[:n]
        else:
            batch_w = None

        for group in groups:
            names = [g for g in group
                     if rsq.bits_for(i, g) < 16]
            if not names:
                continue
            use_w = batch_w is not None and rsq.weighting.applies_to(group)
            if use_w:
                wts = batch_w / batch_w.mean(axis=1, keepdims=True)
            else:
                wts = np.ones((n, L), np.float32)
            d_in = lp[group[0]]["w"].shape[0]
            H = jnp.zeros((d_in, d_in), jnp.float32)
            # chunk samples: fewer dispatches, batched MXU einsums; padding
            # samples carry zero weights so they contribute nothing
            chunk = min(8, n)
            pad = (-n) % chunk
            inps_p = np.concatenate(
                [inps, np.zeros((pad, *inps.shape[1:]), inps.dtype)])                 if pad else inps
            wts_p = np.concatenate([wts, np.zeros((pad, L), np.float32)])                 if pad else wts
            for j in range(0, n + pad, chunk):
                H = _hessian_accumulate(
                    H, lp, jnp.asarray(inps_p[j:j + chunk]),
                    jnp.asarray(wts_p[j:j + chunk]),
                    cos, sin, cfg, policy, group, mask, layer=i)
            H = H * (2.0 / n)

            for name in names:
                bits = rsq.bits_for(i, name)
                wq = dataclasses.replace(rsq.w, bits=bits)
                Wt = lp[name]["w"].T  # gptq convention (out, in)
                if rsq.e8p:
                    from rsq_tpu.quantize.ldlq import ldlq_quantize
                    Qw, info = ldlq_quantize(Wt, H, add_until_fail=rsq.gptq.add_until_fail)
                elif rsq.w_rtn:
                    Qw, info = rtn_quantize(Wt, wq)
                else:
                    Qw, info = gptq_quantize(Wt, H, wq, rsq.gptq)
                lp[name] = {"w": Qw.T.astype(lp[name]["w"].dtype),
                            "b": lp[name].get("b")}
                quantizers[f"layers.{i}.{name}"] = {
                    "scale": np.asarray(info["scale"]),
                    "zero": np.asarray(info.get("zero", 0)),
                    "bits": bits,
                }
            del H

        # recompute this layer's outputs with quantized weights -> next inputs
        chunk = min(8, n)
        j = 0
        while j < n:
            c = min(chunk, n - j)
            inps[j:j + c] = np.asarray(_layer_out(
                lp, jnp.asarray(inps[j:j + c]), cos, sin, cfg, policy, mask,
                layer=i))
            j += c
        new_layers.append(_park(lp))
        logger.info("layer %d quantized in %.1fs", i,
                    time.perf_counter() - t_layer)

    new_params = dict(params)
    new_params["layers"] = new_layers
    logger.info("quantization time: %.1fs", time.perf_counter() - t_start)
    return new_params, quantizers
