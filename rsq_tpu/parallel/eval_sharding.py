"""Sharded big-model evaluation (dense / fake-quant models).

Counterpart of the reference's accelerate-based `distribute_model`
(fake_quant/utils.py:319-339), which merely PLACES layers on different GPUs
(pipeline-style, sequential). Here the model is tensor-sharded with
NamedSharding and evaluated under plain jit — XLA inserts the collectives —
so all chips compute concurrently instead of one at a time.

Sharding rules for the dense pytree (weights (in, out)):
  q/k/v/up/gate: P(None, "tp")   o/down: P("tp", None)
  embed/lm_head: vocab over "tp" is possible but gathers on every lookup;
  replicated by default. Batch over "dp" at the eval call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rsq_tpu.models.config import ModelConfig

_COL = ("q", "k", "v", "up", "gate")
_ROW = ("o", "down")


def model_param_specs(params):
    def lin_spec(name, p):
        if name in _COL:
            w = P(None, "tp")
            b = P("tp")
        elif name in _ROW:
            w = P("tp", None)
            b = P()
        else:
            w = b = P()
        return {"w": w, "b": b if p.get("b") is not None else None}

    layers = []
    for lp in params["layers"]:
        spec = {}
        for name, p in lp.items():
            if isinstance(p, dict):
                spec[name] = lin_spec(name, p)
            else:
                spec[name] = P() if p is not None else None
        layers.append(spec)
    return {
        "embed": P(),
        "final_norm": P() if params.get("final_norm") is not None else None,
        "lm_head": P(),
        "layers": layers,
    }


def distribute_model(params, mesh: Mesh):
    """Shard a dense model pytree over the mesh for evaluation."""
    specs = model_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
        if x is not None else None,
        params, specs, is_leaf=lambda x: x is None)


def sharded_ppl(params, cfg: ModelConfig, policy, token_stream,
                val_seqlen: int, mesh: Mesh, bsz: int = 8) -> float:
    """PPL with tensor-sharded weights and dp-sharded batches."""
    from rsq_tpu.eval.ppl import _batch_nll

    params = distribute_model(params, mesh)
    stream = np.asarray(token_stream).reshape(-1)
    nsamples = stream.size // val_seqlen
    ids = stream[: nsamples * val_seqlen].reshape(nsamples, val_seqlen)
    dp = mesh.shape.get("dp", 1)
    bsz = max(bsz - bsz % dp, dp)

    nlls = []
    data_sharding = NamedSharding(mesh, P("dp", None))
    for s in range(0, nsamples - nsamples % bsz, bsz):
        batch = jax.device_put(jnp.asarray(ids[s: s + bsz]), data_sharding)
        nlls.append(np.asarray(_batch_nll(params, batch, cfg, policy)))
    return float(np.exp(np.concatenate(nlls).mean()))
