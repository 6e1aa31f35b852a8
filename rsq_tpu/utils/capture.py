"""Layer IO capture and activation dumping (debug tooling).

Counterpart of the reference's `capture_layer_io` (model_utils.py:266-316)
and `cache_activation.py`: record the inputs feeding each projection group
of one decoder layer, and dump arbitrary named activations to disk for
offline analysis.  The functional model makes this hook-free: the same
sub-forward functions the quantizer uses produce the captures.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import QuantPolicy
from rsq_tpu.quantize.pipeline import GROUPS, group_input
from rsq_tpu.models import llama as M


def capture_layer_io(lp, xs, cfg: ModelConfig, policy: QuantPolicy):
    """Inputs to every projection group of one layer, for all samples.

    xs: (N, L, d). Returns {"qkv": (N,L,d), "o": ..., "up_gate": ...,
    "down": ..., "output": (N,L,d)} as host numpy arrays."""
    L = xs.shape[1]
    cos, sin = M.rope_tables(cfg, jnp.arange(L))
    mask = M.causal_mask(L)
    names = {("q", "k", "v"): "qkv", ("o",): "o", ("up", "gate"): "up_gate",
             ("down",): "down"}
    out = {}
    for group in GROUPS:
        caps = [np.asarray(group_input(lp, jnp.asarray(xs[j:j + 1]), cos, sin,
                                       cfg, policy, group, mask)[0])
                for j in range(xs.shape[0])]
        out[names[group]] = np.stack(caps)
    outs = [np.asarray(M.layer_forward(lp, jnp.asarray(xs[j:j + 1]), cos, sin,
                                       cfg, policy, mask)[0])
            for j in range(xs.shape[0])]
    out["output"] = np.stack(outs)
    return out


def save_layer_io(path: str, captured: dict):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **captured)


def activation_stats(captured: dict) -> dict:
    """Outlier diagnostics per capture point: max/|rms| ratio and kurtosis —
    the quantities the rotation is supposed to shrink."""
    stats = {}
    for name, arr in captured.items():
        a = arr.astype(np.float64).reshape(-1)
        rms = np.sqrt(np.mean(a ** 2)) + 1e-12
        kurt = np.mean((a / rms) ** 4)
        stats[name] = {"max_over_rms": float(np.max(np.abs(a)) / rms),
                       "kurtosis": float(kurt)}
    return stats
