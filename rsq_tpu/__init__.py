"""rsq_tpu — a TPU-native (JAX/XLA/Pallas) framework for RSQ quantization.

Re-implements, TPU-first, the capabilities of the RSQ reference
("RSQ: Learning from Important Tokens Leads to Better Quantized LLMs",
arXiv:2503.01820; reference repo ylsung/rsq):

  rotate  — QuaRot-style Hadamard/orthogonal rotation of the whole network
            (norm fusion + global orthogonal Q + per-head exact Hadamards),
  scale   — per-token importance weighting of the layer-wise second-order
            statistics (GPTQ Hessian),
  quantize— GPTQ / RTN / LDLQ+E8P column-wise weight quantization, plus
            activation / KV-cache fake quantization (W4A4KV4), and a real
            INT4 serving path built on Pallas TPU kernels.

Layering (bottom-up): core/ (numerics) -> kernels/ (Pallas) -> models/
(functional Llama-family) -> quantize/ (RSQ pipeline) -> serving/ + eval/.
"""

__version__ = "0.1.0"
