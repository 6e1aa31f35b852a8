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


def _flatten(params, quantizers):
    arrays = {}
    arrays["embed"] = np.asarray(params["embed"])
    if params.get("final_norm") is not None:
        arrays["final_norm"] = np.asarray(params["final_norm"])
    arrays["lm_head"] = np.asarray(params["lm_head"])
    for i, lp in enumerate(params["layers"]):
        for norm in ("input_norm", "post_norm"):
            if lp.get(norm) is not None:
                arrays[f"layers.{i}.{norm}"] = np.asarray(lp[norm])
        for name in _LAYER_LINEARS:
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
    arrays = _flatten(params, quantizers)
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


def load_quantized(path: str, dtype=jnp.float32):
    """Returns (params, quantizers, cfg, manifest)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    cd = dict(manifest["model_config"])
    if cd.get("rope_scaling"):
        cd["rope_scaling"] = RopeScaling(**cd["rope_scaling"])
    cfg = ModelConfig(**cd)
    z = np.load(os.path.join(path, "arrays.npz"))

    def arr(key, required=True):
        if key in z:
            return jnp.asarray(z[key], dtype if z[key].dtype.kind == "f" else None)
        if required:
            raise KeyError(key)
        return None

    layers = []
    for i in range(cfg.num_layers):
        lp = {
            "input_norm": arr(f"layers.{i}.input_norm", required=False),
            "post_norm": arr(f"layers.{i}.post_norm", required=False),
        }
        for name in _LAYER_LINEARS:
            lp[name] = {"w": arr(f"layers.{i}.{name}.w"),
                        "b": arr(f"layers.{i}.{name}.b", required=False)}
        layers.append(lp)
    params = {
        "embed": arr("embed"),
        "final_norm": arr("final_norm", required=False),
        "lm_head": arr("lm_head"),
        "layers": layers,
    }
    quantizers = {}
    for key in manifest["quantizer_bits"]:
        quantizers[key] = {
            "scale": np.asarray(z[f"quant.{key}.scale"]),
            "zero": np.asarray(z[f"quant.{key}.zero"]),
            "bits": manifest["quantizer_bits"][key],
        }
    return params, quantizers, cfg, manifest
