"""Token-importance weighting — the "S" (scale) in RSQ.

Functional re-design of the reference's InputWeightingModule class tree
(fake_quant/input_weighting_module.py): every strategy is a pure function
(sample -> per-token weights (L,)) plus one shared post-processing pipeline
(scale -> position-normalize -> min-max normalize -> mask/truncate/bin),
matching :25-63 and the per-class pipelines.

Strategies (YAML names in configs/input_weighting/*.yaml):
  attncon   OriginalAttentionWeighting (:134-212) — per-token attention
            received, summed over heads and queries
  heuristic AdhocMaskingWeighting (:215-240) — chunk patterns like "0_8"
  actnorm   MagnitudeWeighting (:243-302) — input/output L2 norm
  cluster   ClusterWeighting (:305-379) — distance to nearest KMeans centroid
  tokensim  MaxDistWeighting (:382-444) — mean pairwise squared distance
  actdiff   MaxDiffWeighting (:447-500) — ||out - in|| per token
  tokenfreq TokenFreqWeighting (:503-552)
  dot       DotWeighting (:555-611) — Gram-row sums
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rsq_tpu.models import llama as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import QuantPolicy


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class WeightingConfig:
    method: str = "attncon"
    min_value: float = 1.0
    max_value: float = 3.0
    normalize: str | None = "default"   # None | linear | sqrt | default
    scale: str | None = None            # None | square | sqrt
    num_bins: int | None = None
    masking: float | None = None
    truncate: float | None = None
    quantile_value: float | None = None
    reverse: bool = False
    input_or_output: str = "input"
    n_clusters: int = 100
    method_type: str = "first_half"     # for heuristic masks
    # which projection groups the weighting applies to ("all" or substrings)
    apply_module: str = "all"
    # custom calibration attention (block/window/topk/sink/ss) for attncon
    custom_attn_type: str | None = None
    attn_length: int | None = None
    num_sink_token: int = 8

    def applies_to(self, group_names) -> bool:
        if self.apply_module == "all":
            return True
        return any(tok in name for tok in self.apply_module.split("|")
                   for name in group_names)


# ---------------------------------------------------------------------------
# Shared post-processing (normalize_weight / bin_the_values, iwm.py:25-63)
# ---------------------------------------------------------------------------

def _minmax_normalize(w, cfg: WeightingConfig):
    if cfg.quantile_value is not None:
        q_hi = max(cfg.quantile_value, 1 - cfg.quantile_value)
        lo = jnp.quantile(w, 1 - q_hi)
        hi = jnp.quantile(w, q_hi)
    else:
        lo, hi = jnp.min(w), jnp.max(w)
    # degenerate (constant) weights map to min_value; after the Hessian's
    # mean-1 renormalization that is identical to no weighting.
    w = (w - lo) / jnp.maximum(hi - lo, 1e-20)
    w = w * (cfg.max_value - cfg.min_value) + cfg.min_value
    return jnp.clip(w, cfg.min_value, cfg.max_value)


def _bin_values(w, cfg: WeightingConfig):
    nb = cfg.num_bins
    qs = jnp.linspace(0.0, 1.0, nb + 1)[1:-1]
    thresholds = jnp.quantile(w, qs)
    vlist = jnp.linspace(cfg.min_value, cfg.max_value, nb)
    idx = jnp.searchsorted(thresholds, w, side="left")
    return vlist[idx]


def postprocess(w, cfg: WeightingConfig):
    """scale -> reverse -> position normalize -> min-max -> mask/trunc/bin."""
    w = w.astype(jnp.float32)
    L = w.shape[0]
    if cfg.scale == "square":
        w = w ** 2
    elif cfg.scale == "sqrt":
        w = w ** 0.5
    if cfg.reverse:
        w = -w
    if cfg.normalize in ("linear", "sqrt"):
        denom = jnp.arange(L, dtype=jnp.float32)[::-1] + 1
        if cfg.normalize == "sqrt":
            denom = jnp.sqrt(denom)
        w = w / denom
        w = _minmax_normalize(w, cfg)
    elif cfg.normalize == "default":
        w = _minmax_normalize(w, cfg)
    if cfg.masking is not None:
        k = int(L * cfg.masking)
        idx = jnp.argsort(w)[:k]  # smallest k
        w = jnp.ones_like(w).at[idx].set(0.0)
    elif cfg.truncate is not None:
        k = int(L * cfg.truncate)
        idx = jnp.argsort(w)[:k]
        w = w.at[idx].set(0.0)
    elif cfg.num_bins is not None:
        w = _bin_values(w, cfg)
    return w


# ---------------------------------------------------------------------------
# Calibration-time attention masks (attn_module.py:154-286). All operate on
# pre-softmax logits of shape (..., L, L).
# ---------------------------------------------------------------------------

NEG = -1e30


def block_attn_mask(L: int, n: int):
    i = jnp.arange(L)[:, None]
    j = jnp.arange(L)[None, :]
    allowed = (i // n == j // n) & (j <= i)
    return jnp.where(allowed, 0.0, NEG)


def window_attn_mask(L: int, n: int):
    i = jnp.arange(L)[:, None]
    j = jnp.arange(L)[None, :]
    d = i - j
    return jnp.where((d >= 0) & (d < n), 0.0, NEG)


def sink_attn_mask(L: int, n: int, n_sink: int):
    i = jnp.arange(L)[:, None]
    j = jnp.arange(L)[None, :]
    d = i - j
    allowed = (d >= 0) & ((d < n - n_sink) | (j < n_sink))
    return jnp.where(allowed, 0.0, NEG)


def shift_attn_mask(L: int, n: int):
    """Rolled block mask (second half of heads in "ss"): both the block
    membership and the causality test use the ROLLED indices, so shifted
    blocks may span the sequence wrap (convert_to_shift_attn,
    attn_module.py:253-286)."""
    idx = jnp.roll(jnp.arange(L), n // 2)
    bi = idx[:, None] // n
    bj = idx[None, :] // n
    allowed = (bi == bj) & (idx[:, None] >= idx[None, :])
    return jnp.where(allowed, 0.0, NEG)


def apply_topk_to_logits(logits, k: int):
    """Keep only the top-k logits per query row (+ self), mask the rest
    (convert_to_topk_attn, attn_module.py:199-225)."""
    L = logits.shape[-1]
    kth = jnp.sort(logits, axis=-1)[..., L - k][..., None]
    allowed = logits >= kth
    eye = jnp.eye(L, dtype=bool)
    allowed = allowed | eye
    return jnp.where(allowed, logits, NEG)


def calibration_mask(cfg: WeightingConfig, L: int, num_heads: int):
    """Per-head mask (H, L, L) or a single (L, L) mask; None for plain causal.
    "ss" gives half the heads block attention, half shifted-block
    (attn_module.py:419-422)."""
    t = cfg.custom_attn_type
    if t is None:
        return None
    n = cfg.attn_length
    if t == "block":
        return block_attn_mask(L, n)
    if t == "window":
        return window_attn_mask(L, n)
    if t == "sink":
        return sink_attn_mask(L, n, cfg.num_sink_token)
    if t == "ss":
        half = num_heads // 2
        m1 = jnp.broadcast_to(block_attn_mask(L, n), (half, L, L))
        m2 = jnp.broadcast_to(shift_attn_mask(L, n), (num_heads - half, L, L))
        return jnp.concatenate([m1, m2], axis=0)
    if t == "topk":
        return "topk"  # handled on logits inside the attention call
    raise ValueError(f"unknown custom_attn_type {t}")


# ---------------------------------------------------------------------------
# KMeans (Lloyd's) for cluster weighting (kmean_utils.py:5-56)
# ---------------------------------------------------------------------------

def kmeans(x, k: int, iters: int = 30):
    """x: (N, D). Returns (assignments, centroids). Initializes from the
    first k points, like the reference."""
    c = x[:k]

    def step(c, _):
        d = (-2 * x @ c.T + jnp.sum(x * x, 1)[:, None]
             + jnp.sum(c * c, 1)[None, :])
        a = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(a, k, dtype=x.dtype)  # (N, k)
        counts = jnp.clip(onehot.sum(0), min=1.0)
        newc = (onehot.T @ x) / counts[:, None]
        return newc, a

    c, a = jax.lax.scan(step, c, None, length=iters)
    return a[-1], c


# ---------------------------------------------------------------------------
# Strategies
# ---------------------------------------------------------------------------

def _attention_received(lp, x, cfg: ModelConfig, policy: QuantPolicy,
                        wcfg: WeightingConfig, layer: int = 0):
    """Sum over heads and queries of the attention each key receives, using
    the layer's own q/k after input_layernorm (OriginalAttentionWeighting,
    iwm.py:160-189). Computed head-by-head via scan to avoid materializing
    (H, L, L) all at once at seqlen 4096."""
    L = x.shape[0]
    hd, nq, nkv = cfg.head_dim_, cfg.num_attention_heads, cfg.num_key_value_heads
    if cfg.family == "opt":
        from rsq_tpu.models.opt import layer_norm
        h = layer_norm(x[None], lp.get("input_norm"), cfg.rms_norm_eps)
        q = M.linear(h, lp["q"]).reshape(1, L, nq, hd)[0]
        k = M.linear(h, lp["k"]).reshape(1, L, nkv, hd)[0]
    elif cfg.family == "falcon":  # LayerNorm + rotary
        from rsq_tpu.models.opt import layer_norm
        h = layer_norm(x[None], lp.get("input_norm"), cfg.rms_norm_eps)
        cos, sin = M.rope_tables(cfg, jnp.arange(L))
        q = M.linear(h, lp["q"]).reshape(1, L, nq, hd)
        k = M.linear(h, lp["k"]).reshape(1, L, nkv, hd)
        q = M.apply_rope(q, cos, sin)[0]
        k = M.apply_rope(k, cos, sin)[0]
        k = M.repeat_kv(k[None], nq // nkv)[0]
    else:
        if cfg.family == "gemma2":
            from rsq_tpu.models.gemma2 import rms_norm as gemma_norm
            h = gemma_norm(x[None], lp.get("input_norm"), cfg.rms_norm_eps)
        else:
            h = M.rms_norm(x[None], lp.get("input_norm"), cfg.rms_norm_eps)
        cos, sin = M.rope_tables(cfg, jnp.arange(L))
        q = M.linear(h, lp["q"]).reshape(1, L, nq, hd)
        k = M.linear(h, lp["k"]).reshape(1, L, nkv, hd)
        q = M.apply_rope(q, cos, sin)[0]          # (L, nq, hd)
        k = M.apply_rope(k, cos, sin)[0]
        k = M.repeat_kv(k[None], nq // nkv)[0]

    cmask = calibration_mask(wcfg, L, nq)
    causal = M.causal_mask(L)
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    softcap = None
    if cfg.family == "gemma2":
        # the layer's own attention semantics (scale / softcap / window)
        from rsq_tpu.models.gemma2 import _mask_for_layer
        scale = (cfg.query_pre_attn_scalar or hd) ** -0.5
        softcap = cfg.attn_logit_softcap
        causal = _mask_for_layer(L, layer, cfg)

    def head_contrib(carry, i):
        qi = q[:, i, :]
        ki = k[:, i, :]
        logits = (qi @ ki.T) * scale
        if softcap is not None:
            logits = jnp.tanh(logits / softcap) * softcap
        logits = logits + causal
        if isinstance(cmask, str):            # topk
            logits = apply_topk_to_logits(logits, wcfg.attn_length)
        elif cmask is not None:
            m = cmask[i] if cmask.ndim == 3 else cmask
            logits = logits + m
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return carry + jnp.sum(p, axis=0), None

    received, _ = jax.lax.scan(head_contrib, jnp.zeros((L,), jnp.float32),
                               jnp.arange(nq))
    return received


def compute_sample_weight(lp, x, out, token_freq, cfg: ModelConfig,
                          policy: QuantPolicy, wcfg: WeightingConfig,
                          layer: int = 0):
    """Per-token weights for one calibration sample.

    lp: layer params; x/out: (L, d) layer input/output; token_freq: (L,).
    """
    m = wcfg.method
    if m == "attncon":
        w = _attention_received(lp, x, cfg, policy, wcfg, layer=layer)
    elif m == "heuristic":
        return heuristic_weight(x.shape[0], wcfg.method_type)
    elif m == "actnorm":
        t = x if wcfg.input_or_output == "input" else out
        w = jnp.linalg.norm(t.astype(jnp.float32), axis=-1)
    elif m == "actdiff":
        w = jnp.linalg.norm(x.astype(jnp.float32) - out.astype(jnp.float32),
                            axis=-1)
    elif m == "tokenfreq":
        w = token_freq.astype(jnp.float32)
    elif m == "tokensim":
        t = (x if wcfg.input_or_output == "input" else out).astype(jnp.float32)
        sq = jnp.sum(t * t, axis=-1)
        d = -2 * t @ t.T + sq[:, None] + sq[None, :]
        w = jnp.mean(d, axis=1)
    elif m == "cluster":
        t = (x if wcfg.input_or_output == "input" else out).astype(jnp.float32)
        _, c = kmeans(t, wcfg.n_clusters)
        d = (-2 * t @ c.T + jnp.sum(t * t, 1)[:, None]
             + jnp.sum(c * c, 1)[None, :])
        w = jnp.min(d, axis=1)
    elif m == "dot":
        t = (x if wcfg.input_or_output == "input" else out).astype(jnp.float32)
        w = jnp.sum(t @ t.T, axis=-1)
    else:
        raise ValueError(f"unknown weighting method {m}")
    return postprocess(w, wcfg)


def heuristic_weight(L: int, method_type: str):
    """AdhocMaskingWeighting (iwm.py:215-240): binary chunk masks."""
    w = jnp.zeros((L,), jnp.float32)
    if method_type == "first_half":
        return w.at[L // 2:].set(1.0)
    if method_type == "second_half":
        return w.at[:L // 2].set(1.0)
    parts = [int(n) for n in method_type.split("_")]
    total = parts.pop(-1)
    per = L // total
    for p in parts:
        w = w.at[p * per:(p + 1) * per].set(1.0)
    return w


def compute_batch_weighting(lp, inps, outs, token_freqs, cfg: ModelConfig,
                            policy: QuantPolicy, wcfg: WeightingConfig):
    """Weights for every calibration sample: (N, L)."""
    fn = jax.jit(lambda x, o, tf: compute_sample_weight(
        lp, x, o, tf, cfg, policy, wcfg))
    ws = [fn(jnp.asarray(inps[j]), jnp.asarray(outs[j]),
             jnp.asarray(token_freqs[j])) for j in range(len(inps))]
    return jnp.stack(ws)


def token_frequencies(input_ids) -> jnp.ndarray:
    """Corpus token frequency per position (get_token_frequency_for_each_data,
    gptq_utils.py:431-445). input_ids: (N, L) int array."""
    ids = jnp.asarray(input_ids)
    flat = ids.reshape(-1)
    counts = jnp.zeros((int(jnp.max(flat)) + 1,), jnp.int32).at[flat].add(1)
    return counts[ids]
