"""Quantized-checkpoint save/load.

Counterpart of the reference's save/load contract (fake_quant/main.py:94-101
save {"model": state_dict, "w_quantizers": ...}; fake_quant/api.py:9-49
load: re-fuse norms, re-apply ONLY the exact-Hadamard parts — the global
rotation Q is already baked into the saved weights — then load the state).

Format: one directory with
  manifest.json   — model config, rsq config summary, pytree structure
  arrays.npz      — every array leaf (params + quantizer scales)
Pure numpy; no torch pickle. Orbax is available for sharded multi-host
checkpoints later; single-host quantized models are small (INT4).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from rsq_tpu.models.config import ModelConfig, RopeScaling

_LAYER_LINEARS = ("q", "k", "v", "o", "up", "gate", "down")
_OPT_LAYER_LINEARS = ("q", "k", "v", "o", "fc1", "fc2")


def _linear_names(cfg: ModelConfig):
    return (_OPT_LAYER_LINEARS if cfg.family in ("opt", "falcon")
            else _LAYER_LINEARS)


def _put_norm(arrays, key, norm):
    """Norms are bare weight arrays (RMSNorm) or {"w","b"} dicts (OPT
    LayerNorm); None when fused."""
    if norm is None:
        return
    if isinstance(norm, dict):
        arrays[key + ".w"] = np.asarray(norm["w"])
        arrays[key + ".b"] = np.asarray(norm["b"])
    else:
        arrays[key] = np.asarray(norm)


def _flatten(params, quantizers, cfg: ModelConfig):
    arrays = {}
    arrays["embed"] = np.asarray(params["embed"])
    if params.get("embed_pos") is not None:
        arrays["embed_pos"] = np.asarray(params["embed_pos"])
    _put_norm(arrays, "final_norm", params.get("final_norm"))
    arrays["lm_head"] = np.asarray(params["lm_head"])
    if params.get("lm_head_bias") is not None:
        arrays["lm_head_bias"] = np.asarray(params["lm_head_bias"])
    for i, lp in enumerate(params["layers"]):
        for norm in ("input_norm", "post_norm"):
            _put_norm(arrays, f"layers.{i}.{norm}", lp.get(norm))
        for name in _linear_names(cfg):
            arrays[f"layers.{i}.{name}.w"] = np.asarray(lp[name]["w"])
            if lp[name].get("b") is not None:
                arrays[f"layers.{i}.{name}.b"] = np.asarray(lp[name]["b"])
    for key, info in quantizers.items():
        arrays[f"quant.{key}.scale"] = np.asarray(info["scale"])
        arrays[f"quant.{key}.zero"] = np.asarray(info["zero"])
    return arrays


def save_quantized(path: str, params, quantizers, cfg: ModelConfig,
                   meta: dict | None = None):
    os.makedirs(path, exist_ok=True)
    arrays = _flatten(params, quantizers, cfg)
    np.savez(os.path.join(path, "arrays.npz"), **arrays)
    cfg_dict = dataclasses.asdict(cfg)
    manifest = {
        "model_config": cfg_dict,
        "num_layers": cfg.num_layers,
        "quantizer_bits": {k: int(v["bits"]) for k, v in quantizers.items()},
        "meta": meta or {},
        "norms_fused": params["layers"][0].get("input_norm") is None,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def save_quantized_orbax(path: str, params, quantizers, cfg: ModelConfig,
                         meta: dict | None = None):
    """Orbax-backed save: sharded/multi-host capable (each host writes its
    shards; single-host behaves like a plain directory checkpoint). The
    manifest mirrors the npz format so `load_quantized_orbax` reconstructs
    the identical pytree."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    arrays = _flatten(params, quantizers, cfg)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "arrays"), arrays)
    manifest = {
        "model_config": dataclasses.asdict(cfg),
        "num_layers": cfg.num_layers,
        "quantizer_bits": {k: int(v["bits"]) for k, v in quantizers.items()},
        "meta": meta or {},
        "norms_fused": params["layers"][0].get("input_norm") is None,
        "format": "orbax",
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def load_quantized_orbax(path: str, dtype=jnp.float32):
    """Counterpart of save_quantized_orbax; returns the same tuple as
    load_quantized."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    with ocp.PyTreeCheckpointer() as ckptr:
        z = ckptr.restore(os.path.join(path, "arrays"))
    return _unflatten(z, manifest, dtype) + (manifest,)


def load_quantized(path: str, dtype=jnp.float32):
    """Returns (params, quantizers, cfg, manifest)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    z = np.load(os.path.join(path, "arrays.npz"))
    return _unflatten(z, manifest, dtype) + (manifest,)


def _unflatten(z, manifest, dtype=jnp.float32):
    """(key -> array mapping, manifest) -> (params, quantizers, cfg)."""
    cd = dict(manifest["model_config"])
    if cd.get("rope_scaling"):
        cd["rope_scaling"] = RopeScaling(**cd["rope_scaling"])
    cfg = ModelConfig(**cd)

    def arr(key, required=True):
        if key in z:
            return jnp.asarray(z[key], dtype if z[key].dtype.kind == "f" else None)
        if required:
            raise KeyError(key)
        return None

    def norm(key):
        if f"{key}.w" in z:
            return {"w": arr(f"{key}.w"), "b": arr(f"{key}.b")}
        return arr(key, required=False)

    layers = []
    for i in range(cfg.num_layers):
        lp = {
            "input_norm": norm(f"layers.{i}.input_norm"),
            "post_norm": norm(f"layers.{i}.post_norm"),
        }
        for name in _linear_names(cfg):
            lp[name] = {"w": arr(f"layers.{i}.{name}.w"),
                        "b": arr(f"layers.{i}.{name}.b", required=False)}
        layers.append(lp)
    params = {
        "embed": arr("embed"),
        "final_norm": norm("final_norm"),
        "lm_head": arr("lm_head"),
        "layers": layers,
    }
    if "embed_pos" in z:
        params["embed_pos"] = arr("embed_pos")
    if "lm_head_bias" in z:
        params["lm_head_bias"] = arr("lm_head_bias")
    quantizers = {}
    for key in manifest["quantizer_bits"]:
        quantizers[key] = {
            "scale": np.asarray(z[f"quant.{key}.scale"]),
            "zero": np.asarray(z[f"quant.{key}.zero"]),
            "bits": manifest["quantizer_bits"][key],
        }
    return params, quantizers, cfg
