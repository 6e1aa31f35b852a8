"""Golden parity vs the reference implementation.

Executes the reference's OWN torch GPTQ engine (read-only mount at
/root/reference, CUDA deps stubbed, CPU) on identical inputs and compares
against our solver: same weights, same calibration activations, same
config -> the quantized weights must agree to f32 tolerance.

This is validation-by-execution of public reference code — nothing is
copied; the reference modules are imported from their mount.
"""

import sys
import types

import numpy as np
import pytest


def _stub_cuda_deps():
    import importlib.machinery
    import torch

    if "fast_hadamard_transform" not in sys.modules:
        m = types.ModuleType("fast_hadamard_transform")
        m.__spec__ = importlib.machinery.ModuleSpec(
            "fast_hadamard_transform", None)

        def hadamard_transform(x, scale=1.0):
            n = x.shape[-1]
            H = torch.tensor([[1.0]])
            while H.shape[0] < n:
                H = torch.cat([torch.cat([H, H], 1),
                               torch.cat([H, -H], 1)], 0)
            return (x @ H.to(x.dtype)) * scale

        m.hadamard_transform = hadamard_transform
        sys.modules["fast_hadamard_transform"] = m
    if "quiptools_cuda" not in sys.modules:
        q = types.ModuleType("quiptools_cuda")
        q.__spec__ = importlib.machinery.ModuleSpec("quiptools_cuda", None)
        sys.modules["quiptools_cuda"] = q


def _import_ref_gptq():
    """Import the reference gptq_utils, shimming transformers-4.45 symbols
    its attn_module expects."""
    _stub_cuda_deps()
    import torch
    if not torch.cuda.is_available():  # reference calls these unconditionally
        torch.cuda.synchronize = lambda *a, **k: None
        torch.cuda.empty_cache = lambda *a, **k: None
    import transformers.models.llama.modeling_llama as ml
    if not hasattr(ml, "_prepare_4d_causal_attention_mask_with_cache_position"):
        ml._prepare_4d_causal_attention_mask_with_cache_position = (
            lambda *a, **k: None)
    sys.path.insert(0, "/root/reference/fake_quant")
    try:
        import gptq_utils as ref_gptq
        import quant_utils as ref_qu
    finally:
        sys.path.remove("/root/reference/fake_quant")
    return ref_gptq, ref_qu


def _reference_gptq(W, X, bits, w_clip, weighting=None, groupsize=-1,
                    actorder=False):
    """Run the reference GPTQ on (out,in) weights with activations X
    (n, L, in). Returns the quantized weight matrix."""
    import torch
    ref_gptq, ref_qu = _import_ref_gptq()
    lin = torch.nn.Linear(W.shape[1], W.shape[0], bias=False)
    lin.weight.data = torch.tensor(W)
    g = ref_gptq.GPTQ(lin)
    g.quantizer = ref_qu.WeightQuantizer()
    g.quantizer.configure(bits, perchannel=True, sym=True, mse=w_clip)
    for j in range(X.shape[0]):
        w = None if weighting is None else torch.tensor(weighting[j])
        g.add_batch(torch.tensor(X[j]), None, w)
    g.fasterquant(percdamp=0.01, groupsize=groupsize, actorder=actorder,
                  static_groups=False)
    return lin.weight.data.numpy()


@pytest.mark.parametrize("w_clip,weighted,groupsize,actorder", [
    (False, False, -1, False),
    (True, False, -1, False),
    (False, True, -1, False),
    (False, False, 32, False),
    (False, False, -1, True),
])
def test_gptq_solver_matches_reference(w_clip, weighted, groupsize, actorder):
    import jax.numpy as jnp
    from rsq_tpu.core.quant import WeightQuantConfig
    from rsq_tpu.quantize.gptq import (
        GPTQConfig, gptq_quantize, hessian_from_inputs)

    rng = np.random.default_rng(0)
    out_f, in_f, n, L = 24, 64, 6, 32
    W = (rng.standard_normal((out_f, in_f)) * 0.1).astype(np.float32)
    A = rng.standard_normal((in_f, in_f)).astype(np.float32)
    X = (rng.standard_normal((n, L, in_f)) @ A * 0.2).astype(np.float32)
    weighting = (rng.uniform(0.1, 2.0, size=(n, L)).astype(np.float32)
                 if weighted else None)

    ref_Q = _reference_gptq(W, X, 4, w_clip, weighting, groupsize, actorder)

    H = hessian_from_inputs(jnp.asarray(X),
                            None if weighting is None
                            else jnp.asarray(weighting))
    wq = WeightQuantConfig(bits=4, sym=True, mse=w_clip)
    our_Q, _ = gptq_quantize(jnp.asarray(W), H, wq,
                             GPTQConfig(blocksize=128, groupsize=groupsize,
                                        actorder=actorder))
    our_Q = np.asarray(our_Q)

    denom = np.abs(ref_Q).max()
    assert np.abs(our_Q - ref_Q).max() / denom < 2e-2
    # the vast majority of grid points must coincide exactly
    frac = np.mean(np.isclose(our_Q, ref_Q, rtol=1e-4, atol=1e-6))
    assert frac > 0.97, frac


def test_weight_quantizer_matches_reference():
    """Per-channel minmax + MSE clip search parity (scale-for-scale)."""
    import torch
    import jax.numpy as jnp
    from rsq_tpu.core.quant import WeightQuantConfig, weight_quant_params

    ref_gptq, ref_qu = _import_ref_gptq()
    rng = np.random.default_rng(1)
    W = (rng.standard_normal((16, 96)) ** 3 * 0.1).astype(np.float32)

    for mse in (False, True):
        q = ref_qu.WeightQuantizer()
        q.configure(4, perchannel=True, sym=True, mse=mse)
        q.find_params(torch.tensor(W))
        ref_scale = q.scale.numpy().reshape(-1)

        ours, _ = weight_quant_params(jnp.asarray(W),
                                      WeightQuantConfig(bits=4, sym=True,
                                                        mse=mse))
        np.testing.assert_allclose(np.asarray(ours).reshape(-1), ref_scale,
                                   rtol=1e-4, atol=1e-7)


def test_act_quantizer_matches_reference():
    import torch
    import jax.numpy as jnp
    from rsq_tpu.core.quant import ActQuantConfig, act_fake_quant

    ref_gptq, ref_qu = _import_ref_gptq()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 64)).astype(np.float32)

    for sym in (True, False):
        aq = ref_qu.ActQuantizer()
        aq.configure(bits=4, groupsize=-1, sym=sym, clip_ratio=1.0)
        aq.find_params(torch.tensor(x))
        ref_y = aq(torch.tensor(x)).numpy()

        ours = act_fake_quant(jnp.asarray(x),
                              ActQuantConfig(bits=4, sym=sym))
        np.testing.assert_allclose(np.asarray(ours), ref_y, rtol=1e-5,
                                   atol=1e-6)
