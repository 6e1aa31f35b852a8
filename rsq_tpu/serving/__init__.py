"""Real-quantized serving stack: packed INT4 parameters, INT4 KV cache,
prefill + decode engine (the reference's quarot/ + e2e/ equivalent)."""
