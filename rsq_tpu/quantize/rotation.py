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
    get_orthogonal_matrix, hadU_supported, matmul_hadU_np)
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


def _fuse_affine_ln_into(linears: list[dict], norm: dict) -> None:
    """LayerNorm (weight + bias) fusion: W[i,:] *= w[i], b' += b_ln @ W
    (fuse_ln_linear with bias, rotation_utils.py:12-27)."""
    nw, nb = _np64(norm["w"]), _np64(norm["b"])
    for p in linears:
        W = _np64(p["w"])
        b0 = _np64(p["b"]) if p.get("b") is not None else np.zeros(W.shape[1])
        p["w"] = _like(W * nw[:, None], p["w"])
        p["b"] = _like(b0 + nb @ W, p["w"])


def _bake_mean_out(p) -> None:
    """Bake output-mean subtraction into an output-side linear
    (bake_mean_into_linear, rotation_utils.py:29-43): W' = W(I - 11^T/d)."""
    W = _np64(p["w"])
    p["w"] = _like(W - W.mean(axis=-1, keepdims=True), p["w"])
    if p.get("b") is not None:
        b = _np64(p["b"])
        p["b"] = _like(b - b.mean(), p["b"])


def fuse_norms(params, cfg: ModelConfig):
    """Fold all norm affine params into adjacent linears; mean-center
    embeddings.  Returns a new params pytree with
    `input_norm`/`post_norm`/`final_norm` set to None (weightless RMSN).

    OPT (LayerNorm family): norm weight AND bias fold into the following
    linears, and mean-subtraction is baked into out_proj/fc2 so the residual
    stream stays zero-mean — which is what makes the weightless RMSN
    equivalent to the original LayerNorm (rotation_utils.py:64-90)."""
    out = {k: params[k] for k in params if k not in
           ("embed", "layers", "final_norm", "lm_head")}
    out.update({"embed": None, "layers": [], "final_norm": None,
                "lm_head": None})

    E = _np64(params["embed"])
    out["embed"] = _like(E - E.mean(axis=-1, keepdims=True), params["embed"])
    if "embed_pos" in params:  # OPT learned positions add into the stream
        P = _np64(params["embed_pos"])
        out["embed_pos"] = _like(P - P.mean(axis=-1, keepdims=True),
                                 params["embed_pos"])

    ln_family = cfg.family in ("opt", "falcon")
    for lp in params["layers"]:
        nlp = {k: (dict(v) if isinstance(v, dict) else v) for k, v in lp.items()}
        if cfg.family == "falcon":
            # parallel topology: input_norm feeds q/k/v (and fc1 when the
            # MLP shares it, falcon-7b); ln_mlp (post_norm) feeds fc1 on the
            # 40B-style two-norm variant.  Both sub-block outputs add into
            # the residual, so o AND fc2 get the mean baked out.
            attn_side = [nlp["q"], nlp["k"], nlp["v"]]
            if lp.get("post_norm") is None:
                attn_side.append(nlp["fc1"])
            else:
                _fuse_affine_ln_into([nlp["fc1"]], lp["post_norm"])
            _fuse_affine_ln_into(attn_side, lp["input_norm"])
            _bake_mean_out(nlp["o"])
            _bake_mean_out(nlp["fc2"])
        elif ln_family:
            _fuse_affine_ln_into([nlp["q"], nlp["k"], nlp["v"]],
                                 lp["input_norm"])
            _fuse_affine_ln_into([nlp["fc1"]], lp["post_norm"])
            _bake_mean_out(nlp["o"])
            _bake_mean_out(nlp["fc2"])
        else:
            _fuse_ln_into([nlp["q"], nlp["k"], nlp["v"]], lp["input_norm"])
            _fuse_ln_into([nlp["up"], nlp["gate"]], lp["post_norm"])
        nlp["input_norm"] = None
        nlp["post_norm"] = None
        out["layers"].append(nlp)

    if ln_family:
        hp = {"w": params["lm_head"],
              "b": params.get("lm_head_bias")}
        _fuse_affine_ln_into([hp], params["final_norm"])
        out["lm_head"] = hp["w"]
        out["lm_head_bias"] = hp["b"]  # final-LN bias becomes a logit offset
    else:
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


def _had_in_per_head(p, head_dim: int):
    """Per-head exact Hadamard on the INPUT dim (o_proj, Falcon pairing):
    W'[h] = Ĥ W[h] for each head_dim row block.  Pairs with
    _had_out_per_head on v: Ĥ is symmetric for pow2 head dims, so
    attn·blockdiag(Ĥ) · blockdiag(Ĥ)·W_o = attn·W_o with NO online op —
    required for Falcon, whose 71-head q_dim admits no head-mixing
    Hadamard (71 is odd; no H_71 exists)."""
    W = _np64(p["w"])
    in_d, out_d = W.shape
    Wr = W.reshape(in_d // head_dim, head_dim, out_d)
    p["w"] = _like(matmul_hadU_np(Wr.swapaxes(-1, -2)).swapaxes(-1, -2)
                   .reshape(in_d, out_d), p["w"])


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
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = [{k: (dict(v) if isinstance(v, dict) else v)
                      for k, v in lp.items()} for lp in params["layers"]]
    return out


def rotate(params, cfg: ModelConfig, Q: np.ndarray):
    """Apply the global rotation Q plus the exact Hadamards. Expects norms
    already fused (fuse_norms)."""
    out = _copy_layers(params)
    out["embed"] = _like(_np64(params["embed"]) @ Q, params["embed"])
    if "embed_pos" in params:  # OPT learned positions live in the stream too
        out["embed_pos"] = _like(_np64(params["embed_pos"]) @ Q,
                                 params["embed_pos"])
    out["lm_head"] = _like(Q.T @ _np64(params["lm_head"]), params["lm_head"])

    hd = cfg.head_dim_
    mlp_in, mlp_out = (("fc1",), "fc2") if cfg.family in ("opt", "falcon") \
        else (("up", "gate"), "down")
    # falcon-7b's intermediate size (odd part 71) admits no Hadamard; the
    # down/fc2 exact-Hadamard (and its online pair) is skipped there —
    # callers consult hadU_supported when building the forward policy
    had_mlp = hadU_supported(int(_np64(
        out["layers"][0][mlp_out]["w"]).shape[0])) if out["layers"] else True
    for lp in out["layers"]:
        _rot_in(lp["q"], Q)
        _rot_in(lp["k"], Q)
        _rot_in(lp["v"], Q)
        _rot_out(lp["o"], Q)
        for n in mlp_in:
            _rot_in(lp[n], Q)
        _rot_out(lp[mlp_out], Q)
        if had_mlp:
            _had_in(lp[mlp_out])        # pairs with online full Hadamard
        _had_out_per_head(lp["v"], hd)  # pairs with ...
        if cfg.family == "falcon":      # ... fully-offline per-head pair
            _had_in_per_head(lp["o"], hd)
        else:                           # ... the online head-mixing Hadamard
            _had_in(lp["o"])
    return out


def post_rotate_after_load(params, cfg: ModelConfig):
    """Checkpoint-load path: the global Q is baked into saved weights; only
    the exact-Hadamard parts are re-applied (api.py:9-49,
    post_process_model_after_load)."""
    out = _copy_layers(params)
    hd = cfg.head_dim_
    mlp_out = "fc2" if cfg.family in ("opt", "falcon") else "down"
    had_mlp = hadU_supported(cfg.intermediate_size)
    for lp in out["layers"]:
        if had_mlp:
            _had_in(lp[mlp_out])
        _had_out_per_head(lp["v"], hd)
        if cfg.family == "falcon":
            _had_in_per_head(lp["o"], hd)
        else:
            _had_in(lp["o"])
    return out


def rotate_model(params, cfg: ModelConfig, mode: str = "hadamard",
                 seed: int = 0):
    """fuse_norms + rotate with a fresh random orthogonal Q
    (rotation_utils.rotate_model). Returns (params', Q)."""
    if cfg.family == "gemma2":
        # parity with the reference: fuse_layer_norms raises for Gemma
        # (rotation_utils.py:61-68) — its post-sub-block RMSNorms sit between
        # each linear output and the residual add, so the rotation cannot
        # commute through them; Gemma-2 quantizes without rotation upstream
        # too.
        raise NotImplementedError(
            "rotation is not supported for Gemma-2 (post-block norms block "
            "QuaRot fusion); quantize with rotate=False, matching the "
            "reference's fuse_layer_norms contract")
    if mode == "hadamard" and not hadU_supported(cfg.hidden_size):
        mode = "random"  # e.g. falcon-7b hidden 4544 (odd part 71)
    Q = get_orthogonal_matrix(cfg.hidden_size, mode=mode, seed=seed)
    fused = fuse_norms(params, cfg)
    return rotate(fused, cfg, Q), Q
