"""Per-layer QAT finetuning of quantizer parameters (and optionally weights).

Counterpart of fake_quant/optimizers.py (`GradientOptimizer.finetune`,
:173-415): after GPTQ, optimize each layer's quantizer scales/zeros and
(straight-through) float weights against the layer-output MSE, with an
optional output self-similarity loss, early stopping on a validation split,
and separate learning rates for quantizer vs weight parameters.

JAX design: trainable state is a pytree {name: {w_fp, log_scale, zero}};
the STE is `x + stop_gradient(round(x) - x)`; optax.adamw with
optax.multi_transform supplies the two learning-rate groups; the whole
epoch is jitted (scan over minibatches).
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rsq_tpu.core.quant import minq_maxq
from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import QuantPolicy

logger = logging.getLogger(__name__)


def round_ste(x):
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def clamp_ste(x, lo, hi):
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


def qat_fake_quant(w_fp, scale, zero, bits: int, sym: bool):
    """Differentiable fake quantization (QATQuantizedWeights.forward,
    quant_utils.py:35-43): gradients flow to w_fp via STE and to
    scale/zero through the dequant product."""
    _, maxq = minq_maxq(bits, sym)
    if sym:
        q = clamp_ste(round_ste(w_fp / scale), -(maxq + 1), maxq)
        return scale * q
    q = clamp_ste(round_ste(w_fp / scale) + zero, 0, maxq)
    return scale * (q - zero)


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    quant_lr: float = 1e-4
    weight_lr: float = 1e-5
    max_epochs: int = 10
    early_stop: int = 3
    batch_size: int = 1
    train_weights: bool = True
    self_similarity_loss: bool = False
    # attention-matrix loss (optimizers.py:146-168): match the quantized
    # layer's attention to the unquantized layer's on the same inputs —
    # KL on probabilities (attn_loss_on_prob) or MSE on causal-valid logits
    attn_loss: bool = False
    attn_loss_on_prob: bool = True
    attn_loss_weight: float = 1.0
    val_fraction: float = 0.25


def _trainable_from_layer(lp, quantizers, layer_idx: int):
    """Extract {name: {w_fp, scale, zero, bits}} for quantized linears."""
    state = {}
    for name in ("q", "k", "v", "o", "up", "gate", "down"):
        info = quantizers.get(f"layers.{layer_idx}.{name}")
        if info is None or info["bits"] >= 16:
            continue
        scale = jnp.asarray(info["scale"], jnp.float32).reshape(-1, 1)
        zero = jnp.asarray(info["zero"], jnp.float32).reshape(-1, 1) \
            if np.ndim(info["zero"]) else jnp.zeros_like(scale)
        state[name] = {
            "w_fp": jnp.asarray(lp[name]["w"], jnp.float32),
            "scale": scale,
            "zero": zero,
        }
    return state


def _apply_trainable(lp, state, quantizers, layer_idx: int):
    """Build layer params with QAT-quantized weights from trainable state.
    Note scales live per OUTPUT channel = columns of our (in, out) layout."""
    out = dict(lp)
    for name, st in state.items():
        bits = quantizers[f"layers.{layer_idx}.{name}"]["bits"]
        wq = qat_fake_quant(st["w_fp"].T, st["scale"], st["zero"],
                            bits, sym=True).T
        out[name] = {"w": wq, "b": lp[name].get("b")}
    return out


def finetune_layer(lp, quantizers, layer_idx: int, inps, targets,
                   cfg: ModelConfig, policy: QuantPolicy,
                   ft: FinetuneConfig = FinetuneConfig()):
    """Optimize one layer against target outputs.

    inps/targets: (N, L, d) arrays (calibration inputs and the desired layer
    outputs, usually the pre-quantization outputs). Returns (new_lp, info).
    """
    n = inps.shape[0]
    L = inps.shape[1]
    n_val = max(1, int(n * ft.val_fraction))
    n_train = n - n_val
    cos, sin = M.rope_tables(cfg, jnp.arange(L))
    mask = M.causal_mask(L)

    state = _trainable_from_layer(lp, quantizers, layer_idx)
    if not state:
        return lp, {"skipped": True}

    labels = jax.tree_util.tree_map(lambda _: "quant", state)
    for name in state:
        labels[name]["w_fp"] = "weight"
    tx = optax.multi_transform(
        {"quant": optax.adam(ft.quant_lr),
         "weight": optax.adam(ft.weight_lr) if ft.train_weights
         else optax.set_to_zero()},
        labels)
    opt_state = tx.init(state)

    def attn_logits(lyr, x):
        """(b, h, L, L) masked attention logits of a layer on input x."""
        h = M.rms_norm(x, lyr.get("input_norm"), cfg.rms_norm_eps)
        b = x.shape[0]
        hd, nq, nkv = (cfg.head_dim_, cfg.num_attention_heads,
                       cfg.num_key_value_heads)
        q = M.linear(h, lyr["q"]).reshape(b, L, nq, hd)
        k = M.linear(h, lyr["k"]).reshape(b, L, nkv, hd)
        q = M.apply_rope(q, cos, sin)
        k = M.apply_rope(k, cos, sin)
        k = M.repeat_kv(k, nq // nkv)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        return logits / jnp.sqrt(jnp.asarray(hd, jnp.float32)) + mask

    def loss_fn(state, x, y):
        qlp = _apply_trainable(lp, state, quantizers, layer_idx)
        pred = M.layer_forward(qlp, x, cos, sin, cfg, policy, mask)
        mse = jnp.mean((pred.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)
        extra = 0.0
        if ft.attn_loss:
            pl_ = attn_logits(qlp, x)
            tl = jax.lax.stop_gradient(attn_logits(lp, x))
            if ft.attn_loss_on_prob:
                # KLDivLoss(log_target=True) semantics: sum p_t (log p_t - log p_q)
                lp_q = jax.nn.log_softmax(pl_, axis=-1)
                lp_t = jax.nn.log_softmax(tl, axis=-1)
                kl = jnp.sum(jnp.exp(lp_t) * (lp_t - lp_q), axis=-1)
                extra = extra + jnp.mean(kl)
            else:
                valid = mask > -1e10
                diff = jnp.where(valid, pl_ - tl, 0.0)
                extra = extra + (jnp.sum(diff ** 2)
                                 / jnp.maximum(jnp.sum(valid), 1)
                                 / (pl_.shape[0] * pl_.shape[1]))
        if ft.self_similarity_loss:
            ps = jnp.einsum("bld,bmd->blm", pred.astype(jnp.float32),
                            pred.astype(jnp.float32))
            ts = jnp.einsum("bld,bmd->blm", y.astype(jnp.float32),
                            y.astype(jnp.float32))
            triu = jnp.triu(jnp.ones((L, L), bool), k=1)
            extra = jnp.mean(jnp.where(triu[None], (ps - ts) ** 2, 0.0))
        return mse + ft.attn_loss_weight * extra

    @jax.jit
    def train_epoch(state, opt_state, xs, ys):
        def step(carry, batch):
            state, opt_state = carry
            x, y = batch
            loss, grads = jax.value_and_grad(loss_fn)(state, x[None], y[None])
            updates, opt_state = tx.update(grads, opt_state, state)
            state = optax.apply_updates(state, updates)
            return (state, opt_state), loss
        (state, opt_state), losses = jax.lax.scan(
            step, (state, opt_state), (xs, ys))
        return state, opt_state, jnp.mean(losses)

    @jax.jit
    def val_loss(state, xs, ys):
        def one(x, y):
            return loss_fn(state, x[None], y[None])
        return jnp.mean(jax.vmap(one)(xs, ys))

    xs_t = jnp.asarray(inps[:n_train], jnp.float32)
    ys_t = jnp.asarray(targets[:n_train], jnp.float32)
    xs_v = jnp.asarray(inps[n_train:], jnp.float32)
    ys_v = jnp.asarray(targets[n_train:], jnp.float32)

    best_val = float(val_loss(state, xs_v, ys_v))
    best_state = state
    bad = 0
    for epoch in range(ft.max_epochs):
        state, opt_state, train_l = train_epoch(state, opt_state, xs_t, ys_t)
        v = float(val_loss(state, xs_v, ys_v))
        logger.info("layer %d finetune epoch %d: train %.3e val %.3e",
                    layer_idx, epoch, float(train_l), v)
        if v < best_val:
            best_val, best_state, bad = v, state, 0
        else:
            bad += 1
            if bad >= ft.early_stop:
                break

    new_lp = _apply_trainable(lp, best_state, quantizers, layer_idx)
    # materialize as plain dequantized weights in the original dtype
    for name in best_state:
        new_lp[name] = {"w": new_lp[name]["w"].astype(lp[name]["w"].dtype),
                        "b": lp[name].get("b")}
    return new_lp, {"val_loss": best_val}
