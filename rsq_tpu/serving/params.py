"""Serving parameter conversion: fake-quant pytree -> packed INT4 pytree.

Counterpart of the reference's checkpoint converter
(e2e/checkpoint_utils/quantize_llama_checkpoint.py:28-56: re-quantize to
codes, pack, store per-row scales).  Here the fake-quant weights already ARE
scale * code, so the conversion code = round(W / scale) is bit-exact — the
same invariant the reference asserts (gptq_utils.py:622-625).

Serving linear params: {"wp": uint8 (K, N/2) planar, "scale": f32 (N,),
"b": (N,)|None}.  Unquantized tensors (embeddings, lm_head, any 16-bit
layers) stay dense bf16.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rsq_tpu.kernels.matmul_w4 import pack_w4_planar, unpack_w4_planar
from rsq_tpu.models.config import ModelConfig

QUANT_NAMES = ("q", "k", "v", "o", "up", "gate", "down")


def pack_linear(p, scale_rows):
    """p: {"w": (K, N), "b"} fake-quant dequantized weights; scale_rows:
    (N,) or (N, 1) per-output-channel scale (GPTQ layout rows=out)."""
    scale = jnp.asarray(scale_rows, jnp.float32).reshape(-1)
    W = jnp.asarray(p["w"], jnp.float32)
    codes = jnp.clip(jnp.round(W / scale[None, :]), -8, 7).astype(jnp.int8)
    return {
        "wp": pack_w4_planar(codes),
        "scale": scale,
        "b": None if p.get("b") is None else jnp.asarray(p["b"], jnp.bfloat16),
    }


def unpack_linear(sp):
    """Serving params -> dense dequantized weights (test oracle)."""
    codes = unpack_w4_planar(sp["wp"]).astype(jnp.float32)
    return codes * sp["scale"][None, :]


def pack_linear_e8p(p, qinfo):
    """E8P serving params: codes losslessly re-encoded to planar int4 with a
    constant +0.5 offset (w = (q + 0.5) * scale/2 — see
    ldlq.e8p_codes_to_int4), served by the fused affine-W4 kernel at
    4 bits/weight (the reference serves E8P through quiptools_cuda,
    ldlq_utils.py:10; checkpoints still store 2-bit codes)."""
    from rsq_tpu.quantize.ldlq import e8p_codes_to_int4
    q = e8p_codes_to_int4(qinfo["codes"])               # (N, K) int4 values
    return {
        "wp": pack_w4_planar(jnp.asarray(q.T)),          # (K, N/2)
        "sh": jnp.float32(qinfo["scale"]) * jnp.float32(0.5),
        "b": None if p.get("b") is None else jnp.asarray(p["b"], jnp.bfloat16),
    }


def plane_scales(scale) -> jax.Array:
    """(N,) natural per-output scales -> (2, N/2) plane-major: row p holds
    scales for natural outputs [p*N/2, (p+1)*N/2) — a free reshape, matching
    repack_plane_major's byte layout."""
    s = jnp.asarray(scale)
    return s.reshape(2, s.shape[-1] // 2)


def repack_plane_major(wp) -> jax.Array:
    """Adjacent-planar packed uint8 (K, Nh) -> PLANE-MAJOR packed: byte j
    holds natural outputs j (low nibble) and j + Nh (high nibble).

    The paired kernels emit (M, 2, Nh) plane outputs; under this layout the
    un-pairing to natural (M, N) is a FREE reshape, where the adjacent
    layout needs an element-interleave that XLA materializes as relayout
    copies (~0.9 ms of the 10 ms Llama-3-8B decode step, trace r3).  Only
    the single-device decode path (fuse_for_decode) uses it: under TP the
    adjacent layout keeps byte shards aligned with natural column/scale
    shards (parallel/tp._linear_spec)."""
    from rsq_tpu.kernels.matmul_w4 import unpack_w4_planar
    w = unpack_w4_planar(wp)                       # (K, N) natural int8
    u = jnp.where(w < 0, w + 16, w).astype(jnp.uint8)
    nh = u.shape[-1] // 2
    return (u[..., :nh] | (u[..., nh:] << 4)).astype(jnp.uint8)


def _fuse_packed(ps):
    """Concatenate packed linears (same K) along the packed-output axis,
    re-packing each segment plane-major.  Segment widths are recovered from
    the per-segment paired scales, so the fused dict stays a clean pytree
    (no int leaves)."""
    return {
        "wp2": jnp.concatenate([repack_plane_major(p["wp"]) for p in ps],
                               axis=1),
        "scales2": [plane_scales(p["scale"]) for p in ps],
        "bs": [p.get("b") for p in ps],
    }


def fuse_for_decode(params):
    """Fuse q/k/v and up/gate packed linears per layer into single
    concatenated kernel calls — 7 -> 4 Pallas calls per decode layer; the
    measured fixed cost is ~15-20 us/call on v5e, ~2 ms/step at 32 layers
    (benchmarks/decode_profile.py).  Single-device serving only: the TP path
    shards projections individually (parallel/tp.py)."""
    out = dict(params)
    layers = []
    for lp in params["layers"]:
        # only plain sym-scale packed linears fuse; E8P affine entries also
        # carry "wp" but use a per-tensor "sh" scale with a +0.5 offset that
        # the paired kernel would silently drop (ADVICE r2 #2)
        packed = lambda n: (n in lp and "wp" in lp[n] and "scale" in lp[n]
                            and "sh" not in lp[n])
        nlp = dict(lp)
        if all(packed(n) for n in ("q", "k", "v")):
            nlp["qkv"] = _fuse_packed([lp["q"], lp["k"], lp["v"]])
            for n in ("q", "k", "v"):
                del nlp[n]
        if all(packed(n) for n in ("up", "gate")):
            nlp["upgate"] = _fuse_packed([lp["up"], lp["gate"]])
            for n in ("up", "gate"):
                del nlp[n]
        # remaining packed linears (o/down, and E8P affine entries) convert
        # to the plane-major layout too ("wpm"): their un-pairing also
        # becomes a free reshape on the decode path
        for name in list(nlp):
            e = nlp[name]
            if not (isinstance(e, dict) and "wp" in e):
                continue
            if "sh" in e:
                nlp[name] = {"wpm": repack_plane_major(e["wp"]),
                             "sh": e["sh"], "b": e.get("b")}
            elif "scale" in e:
                nlp[name] = {"wpm": repack_plane_major(e["wp"]),
                             "scale2": plane_scales(e["scale"]),
                             "b": e.get("b")}
        layers.append(nlp)
    out["layers"] = layers
    return out


def to_serving_params(params, quantizers, cfg: ModelConfig,
                      dtype=jnp.bfloat16):
    """Convert a quantized fake-quant model pytree + quantizer info from
    quantize_model into the packed serving pytree. Layers/tensors without
    4-bit quantizer info stay dense; E8P (2-bit) layers keep codebook
    codes."""
    out = {
        "embed": jnp.asarray(params["embed"], dtype),
        "final_norm": (None if params["final_norm"] is None
                       else jnp.asarray(params["final_norm"], dtype)),
        "lm_head": jnp.asarray(params["lm_head"], dtype),
        "layers": [],
    }
    for i, lp in enumerate(params["layers"]):
        slp = {}
        for name in ("input_norm", "post_norm"):
            slp[name] = (None if lp.get(name) is None
                         else jnp.asarray(lp[name], dtype))
        for name in QUANT_NAMES:
            qinfo = quantizers.get(f"layers.{i}.{name}")
            if qinfo is not None and "codes" in qinfo:
                slp[name] = pack_linear_e8p(lp[name], qinfo)
            elif qinfo is not None and qinfo["bits"] == 4:
                slp[name] = pack_linear(lp[name], qinfo["scale"])
            else:
                slp[name] = {"w": jnp.asarray(lp[name]["w"], dtype),
                             "b": None if lp[name].get("b") is None
                             else jnp.asarray(lp[name]["b"], dtype)}
        out["layers"].append(slp)
    return out
