"""Counter-based dropout hash shared by every fused kernel.

One murmur3-finalizer stream, defined ONCE: the forward kernels draw masks
in VMEM and the backwards regenerate the identical bits (no HBM mask
tensor), so gradient correctness depends on all call sites using the same
constants/threshold. Counter-based (plain int32 ops) instead of
`pltpu.prng_*` so the same code runs under CPU interpret mode and as plain
XLA ops (test replicas). int32 arithmetic wraps two's-complement under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def i32(v: int) -> np.int32:
    """Python int -> int32 with two's-complement wrapping (NumPy 2 raises
    OverflowError on out-of-range np.int32(...) instead of wrapping; the
    hash only needs CONSISTENT wrapping between kernel and XLA replica)."""
    v &= 0xFFFFFFFF
    return np.int32(v - (1 << 32) if v >= (1 << 31) else v)


def keep_from_idx(idx, seed_expr, salt, rate):
    """Scaled keep mask (0 or 1/(1-rate)) from a global flat index."""
    h = idx * np.int32(-1640531535) + seed_expr + salt    # 0x9E3779B1
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * np.int32(-2048144789)                         # 0x85EBCA6B
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * np.int32(-1028477387)                         # 0xC2B2AE35
    h = h ^ jax.lax.shift_right_logical(h, 16)
    bits = h & np.int32(0x7FFFFFFF)                       # uniform 31-bit
    thresh = np.int32(min(int(rate * 2.0 ** 31), 2 ** 31 - 1))
    return (bits >= thresh).astype(jnp.float32) * (1.0 / (1.0 - rate))
