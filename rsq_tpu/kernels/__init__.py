"""Pallas TPU kernels: fused INT4 matmuls, fast Hadamard transform, paged
INT4 KV-cache attention. Every kernel ships with a pure-jnp oracle and an
equivalence test (the reference's f16-twin pattern, SURVEY.md §4)."""

import jax


def default_interpret(interpret):
    """Pallas kernels compile only on TPU; on the CPU backend (tests,
    virtual multi-chip meshes) fall back to interpret mode automatically."""
    if interpret is not None:
        return interpret
    return jax.default_backend() == "cpu"
