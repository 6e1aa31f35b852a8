"""Quantization wall-clock for an 8B-shaped model on one TPU chip.

Counterpart of the reference's logged quantization time
(fake_quant/main.py:103-104).  Uses random weights + synthetic calibration
(no network), the full RSQ path: rotate -> attncon weighting -> weighted
GPTQ, layer-streamed (weights live on host, one layer on device at a
time).  Prints one JSON line.

Usage: python benchmarks/quant_wallclock.py [nsamples] [seqlen] [layers]
(defaults 16 x 512 x 4 layers: an 8B-shaped model at full depth in f32
does not fit HBM for the random-init used here — real runs stream HF
weights from host — and the per-layer cost is uniform, so the 32-layer
total extrapolates linearly from the probe).
"""

import dataclasses
import json
import sys
import time

import jax

sys.path.insert(0, "/root/repo")


def main(nsamples=16, seqlen=512, layers=4):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rsq_tpu.core.quant import WeightQuantConfig
    from rsq_tpu.models import llama as M
    from rsq_tpu.models.config import ModelConfig
    from rsq_tpu.quantize import data as D
    from rsq_tpu.quantize.pipeline import RSQConfig, quantize_model
    from rsq_tpu.quantize.weighting import WeightingConfig

    cfg = dataclasses.replace(ModelConfig.llama3_8b(), num_layers=layers)
    t0 = time.perf_counter()
    # init on HOST: real runs stream HF weights from host memory; keeping
    # the random probe's full f32 params off the chip leaves HBM to the
    # layer-streamed quantization (device-resident init OOM'd next to the
    # tunnel server's resident allocations)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = M.init_params(cfg, jax.random.PRNGKey(0), scale=0.02)
    t_init = time.perf_counter() - t0

    calib = D.get_loaders("synthetic", nsamples=nsamples, seqlen=seqlen,
                          vocab_size=cfg.vocab_size)
    rsq = RSQConfig(
        w=WeightQuantConfig(bits=4, sym=True, mse=True),
        rotate=True,
        weighting=WeightingConfig(method="attncon", min_value=0.005,
                                  max_value=1.0),
        nsamples=nsamples,
    )
    t0 = time.perf_counter()
    qparams, quantizers = quantize_model(params, cfg, rsq, calib)
    dt = time.perf_counter() - t0
    n_q = sum(1 for k in quantizers)
    print(json.dumps({
        "model_shape": "llama3-8b", "layers": layers,
        "nsamples": nsamples, "seqlen": seqlen,
        "init_seconds": round(t_init, 1),
        "quant_seconds": round(dt, 1),
        "seconds_per_layer": round(dt / layers, 2),
        "est_seconds_32_layers": round(dt / layers * 32, 1),
        "quantized_tensors": n_q,
    }), flush=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
