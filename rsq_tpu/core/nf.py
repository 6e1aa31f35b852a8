"""NormalFloat (NF-k) quantization.

Counterpart of the reference's lq-lora-derived NF quantizer
(fake_quant/nf_utils.py): codebook = inverse Gaussian CDF at evenly spaced
quantiles clipped at the NF4 offset, asymmetric around zero with 2^(k-1)-1
negative and 2^(k-1) nonnegative levels; quantization is bucketize against
midpoint boundaries.  Codebook construction is host scipy/numpy; the
quant/dequant path is jnp (searchsorted + gather) so it fuses under jit.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

NF_OFFSET = 0.9677083  # nf_utils.py:12


@functools.lru_cache(maxsize=None)
def nf_codebook(bits: int) -> np.ndarray:
    """Quantile-of-Gaussian code values (nf_utils.py:74-102)."""
    from scipy.special import erfinv, ndtri
    sigma = -1.0 / (math.sqrt(2) * erfinv(1 - 2 * NF_OFFSET))
    left = np.linspace(1 - NF_OFFSET, 0.5, 2 ** (bits - 1))
    right = np.linspace(0.5, NF_OFFSET, 2 ** (bits - 1) + 1)
    q = np.concatenate([left[:-1], right])
    return (ndtri(q) * sigma).astype(np.float64)


@functools.lru_cache(maxsize=None)
def _boundaries(bits: int) -> np.ndarray:
    v = nf_codebook(bits)
    return ((v[1:] + v[:-1]) / 2.0).astype(np.float64)


def grid_max(bits: int) -> float:
    v = nf_codebook(bits)
    return float(max(abs(v[0]), v[-1]))


def nf_quant(x, bits: int, scale):
    """x -> integer codes (indices into the codebook)."""
    b = jnp.asarray(_boundaries(bits), jnp.float32)
    xs = jnp.asarray(x, jnp.float32) / scale
    return jnp.searchsorted(b, xs, side="left").astype(jnp.int32)


def nf_dequant(codes, bits: int, scale):
    v = jnp.asarray(nf_codebook(bits), jnp.float32)
    return v[codes] * scale


def nf_quant_dequant(x, bits: int, scale):
    return nf_dequant(nf_quant(x, bits, scale), bits, scale)


def nf_find_scale(W, bits: int):
    """Per-row scale: absmax / grid_max (WeightQuantizer.find_params with
    nf=True, quant_utils.py:377-381). W: (rows, cols) -> (rows, 1)."""
    Wf = jnp.asarray(W, jnp.float32)
    zero = jnp.zeros((Wf.shape[0],), jnp.float32)
    xmin = jnp.minimum(Wf.min(axis=1), zero)
    xmax = jnp.maximum(Wf.max(axis=1), zero)
    amax = jnp.clip(jnp.maximum(jnp.abs(xmin), xmax), min=1e-5)
    return (amax / grid_max(bits))[:, None]
