"""BPSK/AWGN channel ops (device-side).

IT++ conventions (used throughout the reference): BPSK maps bit 0 -> +1,
bit 1 -> -1; N0 = 10^(-EbN0dB/10)/rate, noise variance N0/2 per dimension,
soft demodulation LLR = 4y/N0 = 2y/sigma^2 with positive LLR favoring bit 0
(LDPC_BER_Sim.cpp:246-279).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["bpsk_modulate", "awgn", "llr_from_rx", "bpsk_awgn_llr"]


def bpsk_modulate(bits: jnp.ndarray) -> jnp.ndarray:
    return 1.0 - 2.0 * bits.astype(jnp.float32)


def awgn(key, s: jnp.ndarray, sigma) -> jnp.ndarray:
    return s + sigma * jax.random.normal(key, s.shape, dtype=s.dtype)


def llr_from_rx(y: jnp.ndarray, sigma) -> jnp.ndarray:
    return 2.0 * y / (sigma * sigma)


def bpsk_awgn_llr(key, bits: jnp.ndarray, sigma):
    """bits (B, N) -> (llr (B, N) f32, y (B, N) f32)."""
    y = awgn(key, bpsk_modulate(bits), sigma)
    return llr_from_rx(y, sigma), y
