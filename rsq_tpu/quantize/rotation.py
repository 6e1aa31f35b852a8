"""QuaRot-style rotation as pure pytree transforms.

Re-expresses the reference's in-place torch-module surgery
(fake_quant/rotation_utils.py) as functions (params) -> (params'):

  fuse_norms        — RMSNorm weights folded into the following linears and
                      embeddings mean-centered (rotation_utils.py:12-90);
                      norm weights become None (weightless RMSN).
  rotate            — global orthogonal Q applied to embeddings / lm_head /
                      attention & MLP boundaries (rotation_utils.py:256-281)
                      plus the per-head exact Hadamard on v_proj and the full
                      exact Hadamard on o_proj/down_proj inputs that pair
                      with the online transforms (rotate_ov_proj :243-253,
                      rotate_mlp_output :175-191).
  post_rotate_after_load — re-applies only the exact-Hadamard parts, because
                      the global Q is baked into saved weights
                      (post_process_model_after_load :284-301).

All arithmetic runs on the host in float64 (TPUs have no fast f64; the
reference shuttles each matrix CPU<->GPU for the same reason), then casts
back to the parameter dtype.

Weight-layout note: our linears are (in, out), so with rotated activations
a' = a Q the invariant transforms are
  input side  W' = Q^T W,   output side  W' = W Q,
and exact Hadamards on the input dim apply matmul_hadU along axis 0.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rsq_tpu.core.hadamard import (
    get_orthogonal_matrix, matmul_hadU_np)
from rsq_tpu.models.config import ModelConfig

__all__ = ["fuse_norms", "rotate", "post_rotate_after_load", "rotate_model"]


def _np64(x):
    return np.asarray(x, dtype=np.float64)


def _like(x, ref):
    return jnp.asarray(np.asarray(x), dtype=ref.dtype)


def _fuse_ln_into(linears: list[dict], norm_w) -> None:
    """W[i, :] *= norm_w[i] for each following linear (in,out layout)."""
    nw = _np64(norm_w)
    for p in linears:
        W = _np64(p["w"])
        p["w"] = _like(W * nw[:, None], p["w"])


def fuse_norms(params, cfg: ModelConfig):
    """Fold all RMSNorm weights into adjacent linears; mean-center embeddings.

    Returns a new params pytree with `input_norm`/`post_norm`/`final_norm`
    set to None (weightless)."""
    out = {"embed": None, "layers": [], "final_norm": None, "lm_head": None}

    E = _np64(params["embed"])
    out["embed"] = _like(E - E.mean(axis=-1, keepdims=True), params["embed"])

    for lp in params["layers"]:
        nlp = {k: (dict(v) if isinstance(v, dict) else v) for k, v in lp.items()}
        _fuse_ln_into([nlp["q"], nlp["k"], nlp["v"]], lp["input_norm"])
        _fuse_ln_into([nlp["up"], nlp["gate"]], lp["post_norm"])
        nlp["input_norm"] = None
        nlp["post_norm"] = None
        out["layers"].append(nlp)

    HW = _np64(params["lm_head"])
    out["lm_head"] = _like(HW * _np64(params["final_norm"])[:, None],
                           params["lm_head"])
    out["final_norm"] = None
    return out


def _rot_in(p, Q):
    """Input-side rotation: W' = Q^T W."""
    p["w"] = _like(Q.T @ _np64(p["w"]), p["w"])


def _rot_out(p, Q):
    """Output-side rotation: W' = W Q (bias rotates too)."""
    p["w"] = _like(_np64(p["w"]) @ Q, p["w"])
    if p.get("b") is not None:
        p["b"] = _like(_np64(p["b"]) @ Q, p["b"])


def _had_in(p):
    """Exact Hadamard on the input dim: W' = (M/sqrt(n)) W, applied via the
    fast transform on W^T (counterpart of the online matmul_hadU on
    activations)."""
    W = _np64(p["w"])
    p["w"] = _like(matmul_hadU_np(W.T).T, p["w"])


def _had_out_per_head(p, head_dim: int):
    """Per-head exact Hadamard on the output dim (v_proj; rotate_ov_proj)."""
    W = _np64(p["w"])
    in_d, out_d = W.shape
    Wr = W.reshape(in_d, out_d // head_dim, head_dim)
    p["w"] = _like(matmul_hadU_np(Wr).reshape(in_d, out_d), p["w"])
    if p.get("b") is not None:
        b = _np64(p["b"]).reshape(out_d // head_dim, head_dim)
        p["b"] = _like(matmul_hadU_np(b).reshape(out_d), p["b"])


def _copy_layers(params):
    return {
        "embed": params["embed"],
        "layers": [{k: (dict(v) if isinstance(v, dict) else v)
                    for k, v in lp.items()} for lp in params["layers"]],
        "final_norm": params["final_norm"],
        "lm_head": params["lm_head"],
    }


def rotate(params, cfg: ModelConfig, Q: np.ndarray):
    """Apply the global rotation Q plus the exact Hadamards. Expects norms
    already fused (fuse_norms)."""
    out = _copy_layers(params)
    out["embed"] = _like(_np64(params["embed"]) @ Q, params["embed"])
    out["lm_head"] = _like(Q.T @ _np64(params["lm_head"]), params["lm_head"])

    hd = cfg.head_dim_
    for lp in out["layers"]:
        _rot_in(lp["q"], Q)
        _rot_in(lp["k"], Q)
        _rot_in(lp["v"], Q)
        _rot_out(lp["o"], Q)
        _rot_in(lp["up"], Q)
        _rot_in(lp["gate"], Q)
        _rot_out(lp["down"], Q)
        _had_in(lp["down"])             # pairs with online full Hadamard
        _had_out_per_head(lp["v"], hd)  # pairs with ...
        _had_in(lp["o"])                # ... the online head-mixing Hadamard
    return out


def post_rotate_after_load(params, cfg: ModelConfig):
    """Checkpoint-load path: the global Q is baked into saved weights; only
    the exact-Hadamard parts are re-applied (api.py:9-49,
    post_process_model_after_load)."""
    out = _copy_layers(params)
    hd = cfg.head_dim_
    for lp in out["layers"]:
        _had_in(lp["down"])
        _had_out_per_head(lp["v"], hd)
        _had_in(lp["o"])
    return out


def rotate_model(params, cfg: ModelConfig, mode: str = "hadamard",
                 seed: int = 0):
    """fuse_norms + rotate with a fresh random orthogonal Q
    (rotation_utils.rotate_model). Returns (params', Q)."""
    Q = get_orthogonal_matrix(cfg.hidden_size, mode=mode, seed=seed)
    fused = fuse_norms(params, cfg)
    return rotate(fused, cfg, Q), Q
