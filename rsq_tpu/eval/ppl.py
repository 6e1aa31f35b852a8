"""Perplexity evaluation over a long token stream.

Counterpart of the reference's layer-streamed evaluator
(fake_quant/eval_utils.py:10-158): reshape the stream into (nsamples,
val_seqlen), run all batches through each layer in turn, then mean NLL ->
exp.  On TPU the per-batch work is one jitted layer call; for models that
fit in HBM, `ppl_fullmodel` runs the whole forward per batch instead.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rsq_tpu.models import family as M
from rsq_tpu.models.config import ModelConfig
from rsq_tpu.models.policy import QuantPolicy

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("cfg", "policy"))
def _batch_nll(params, ids, cfg, policy):
    """Mean per-sequence NLL for one batch (b, L)."""
    logits = M.forward(params, ids, cfg, policy)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll, axis=1)


def ppl_fullmodel(params, cfg: ModelConfig, policy: QuantPolicy,
                  token_stream, val_seqlen: int, bsz: int = 8) -> float:
    """PPL when the whole model fits on device. token_stream: 1-D int array."""
    stream = np.asarray(token_stream).reshape(-1)
    nsamples = stream.size // val_seqlen
    ids = stream[: nsamples * val_seqlen].reshape(nsamples, val_seqlen)
    nlls = []
    for s in range(0, nsamples - nsamples % bsz, bsz):
        batch = jnp.asarray(ids[s: s + bsz])
        nlls.append(np.asarray(_batch_nll(params, batch, cfg, policy)))
    # remainder batch (kept, unlike the reference which drops ragged tails)
    rem = nsamples % bsz
    if rem and nsamples >= bsz or (rem and not nlls):
        batch = jnp.asarray(ids[nsamples - rem: nsamples])
        nlls.append(np.asarray(_batch_nll(params, batch, cfg, policy)))
    ppl = float(np.exp(np.concatenate(nlls).mean()))
    logger.info("PPL: %.3f", ppl)
    return ppl


@partial(jax.jit, static_argnames=("cfg", "policy", "layer"))
def _layer_batch(lp, x, cos, sin, cfg, policy, mask, layer=0):
    return M.layer_forward(lp, x, cos, sin, cfg, policy, mask, layer=layer)


@partial(jax.jit, static_argnames=("cfg", "policy"))
def _head_nll(params, x, ids, cfg, policy):
    logits = M.head(params, x, cfg)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll, axis=1)


def ppl_streamed(params, cfg: ModelConfig, policy: QuantPolicy,
                 token_stream, val_seqlen: int, bsz: int = 8) -> float:
    """Layer-streamed PPL: activations for ALL batches are kept (host numpy)
    while one layer at a time runs on device — the big-model path
    (eval_utils.py:104-123)."""
    stream = np.asarray(token_stream).reshape(-1)
    nsamples = stream.size // val_seqlen
    ids = stream[: nsamples * val_seqlen].reshape(nsamples, val_seqlen)
    batches = [jnp.asarray(ids[s: s + bsz]) for s in range(0, nsamples, bsz)]

    cos, sin = M.pos_tables(cfg, jnp.arange(val_seqlen))
    # mask=None: each family builds its own causal (+ sliding-window) mask,
    # and the llama path picks flash-chunked attention for long seqlens
    mask = None
    emb = jax.jit(M.embed, static_argnames=("cfg",))
    acts = [np.asarray(emb(params, b, cfg=cfg)) for b in batches]
    for i, lp in enumerate(params["layers"]):
        for j in range(len(batches)):
            acts[j] = np.asarray(_layer_batch(
                lp, jnp.asarray(acts[j]), cos, sin, cfg, policy, mask,
                layer=i))
    nlls = [np.asarray(_head_nll(params, jnp.asarray(acts[j]), batches[j],
                                 cfg, policy))
            for j in range(len(batches))]
    ppl = float(np.exp(np.concatenate(nlls).mean()))
    logger.info("PPL (streamed): %.3f", ppl)
    return ppl


def ppl_pp(params, cfg: ModelConfig, policy: QuantPolicy, token_stream,
           val_seqlen: int, mesh, bsz: int = 8, n_micro: int | None = None
           ) -> float:
    """Pipeline-parallel PPL: layer weights stage-sharded over the mesh's
    `pp` axis (parallel/pp.py GPipe schedule), so models whose weights
    exceed one chip's HBM evaluate at full speed instead of host-streaming
    one layer at a time (ppl_streamed).  Llama-family only (the pipeline's
    stage scan runs llama.layer_forward).

    bsz must divide by n_micro (default: one microbatch per stage)."""
    from rsq_tpu.models import llama as L
    from rsq_tpu.parallel import pp as PP

    pp_size = mesh.shape["pp"]
    n_micro = n_micro or min(bsz, pp_size)
    assert bsz % n_micro == 0, (bsz, n_micro)

    stream = np.asarray(token_stream).reshape(-1)
    nsamples = stream.size // val_seqlen
    ids = stream[: nsamples * val_seqlen].reshape(nsamples, val_seqlen)

    stacked = PP.shard_stacked_layers(
        PP.stack_layers(params["layers"]), mesh)
    head_params = {k: v for k, v in params.items() if k != "layers"}
    fwd = PP.make_pp_forward(cfg, policy, mesh, n_micro=n_micro)

    @jax.jit
    def nll_of(logits, ids):
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]
        return jnp.mean(nll, axis=1)

    nlls = []
    for s in range(0, nsamples - nsamples % bsz, bsz):
        batch = jnp.asarray(ids[s: s + bsz])
        logits = fwd(head_params, stacked, batch)
        nlls.append(np.asarray(nll_of(logits, batch)))
    ppl = float(np.exp(np.concatenate(nlls).mean()))
    logger.info("PPL (pp=%d): %.3f", pp_size, ppl)
    return ppl
