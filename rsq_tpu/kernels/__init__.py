"""Pallas TPU kernels: fused INT4 matmuls, fast Hadamard transform, paged
INT4 KV-cache attention. Every kernel ships with a pure-jnp oracle and an
equivalence test (the reference's f16-twin pattern, SURVEY.md §4)."""
