"""Functional Llama-family models (Llama-2/3, Qwen2.5, Mistral) as pure
pytree + apply functions."""

from rsq_tpu.models.config import ModelConfig  # noqa: F401
