"""Core numerics: quantizer math, Hadamard library, rotations. No model knowledge."""
