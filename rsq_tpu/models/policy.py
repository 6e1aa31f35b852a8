"""Quantization policy: how activations/KV are treated inside the forward.

The reference expresses this as mutable module state spread over
ActQuantWrapper flags (quant_utils.py:249-325), per-site quantizer
`configure` calls (main.py:107-153) and a bytecode monkeypatch for the
post-RoPE QK rotation (rotation_utils.py:317-372).  Here it is one frozen
dataclass threaded through the functional forward; every field is static
under jit so XLA specializes each configuration.
"""

from __future__ import annotations

import dataclasses

from rsq_tpu.core.quant import ActQuantConfig


@dataclasses.dataclass(frozen=True)
class KVQuantConfig:
    """K-cache (post-RoPE, post-Hadamard) quantization.

    groupsize -1 = per-token across the whole k vector (all heads);
    groupsize == head_dim = per-head (QKRotationWrapper, rotation_utils.py:346-353).
    """
    bits: int = 16
    groupsize: int = -1
    sym: bool = True
    clip_ratio: float = 1.0

    @property
    def enabled(self) -> bool:
        return self.bits < 16


@dataclasses.dataclass(frozen=True)
class QuantPolicy:
    """Static per-forward quantization behavior."""
    # input activation quant for every linear (a_bits)
    a: ActQuantConfig = ActQuantConfig()
    # down_proj input override (int8_down_proj / down_proj groupsize, main.py:129-133)
    a_down: ActQuantConfig | None = None
    # v_proj output quant (v_bits, main.py:120-124)
    v: ActQuantConfig = ActQuantConfig()
    # k-cache quant incl. the post-RoPE Hadamard on q and k (k_bits, main.py:140-153)
    k: KVQuantConfig = KVQuantConfig()
    # online Hadamard before down_proj (full, K-block) / o_proj (head-mixing)
    # (main.py:48-65); both are enabled by `rotate`.
    online_had_down: bool = False
    online_had_o: bool = False
    # apply the online transforms in f32 (fp32_had flag)
    fp32_had: bool = False
    # norms are weightless after fusion (RMSN replacement, rotation_utils.py:76-90)
    norms_fused: bool = False

    @property
    def a_down_(self) -> ActQuantConfig:
        return self.a_down if self.a_down is not None else self.a


FP16 = QuantPolicy()


def w4a4kv4(groupsize: int = -1, a_clip: float = 1.0, v_clip: float = 1.0,
            k_clip: float = 1.0) -> QuantPolicy:
    """The headline joint-quantization policy (run_rsq_w4a4kv4.sh)."""
    return QuantPolicy(
        a=ActQuantConfig(bits=4, sym=True, groupsize=groupsize, clip_ratio=a_clip),
        v=ActQuantConfig(bits=4, sym=True, groupsize=groupsize, clip_ratio=v_clip),
        k=KVQuantConfig(bits=4, groupsize=groupsize, sym=True, clip_ratio=k_clip),
        online_had_down=True, online_had_o=True, norms_fused=True)
