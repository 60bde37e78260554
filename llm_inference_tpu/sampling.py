"""Token sampling. The reference implements greedy argmax only (reference
main.cpp:192-194) — that stays the default and the parity contract. The
standard serving knobs (temperature, top-k, top-p) are provided as
on-device extensions; all run inside jit so only the sampled id leaves the
chip.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import Array


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Static sampling parameters (hashable: usable as a jit closure)."""

    temperature: float = 0.0  # 0 => greedy argmax (the reference's sampler)
    top_k: int = 0  # 0 => disabled
    top_p: float = 1.0  # 1.0 => disabled

    @property
    def is_greedy(self) -> bool:
        return self.temperature <= 0.0


def sample(logits: Array, cfg: SamplingConfig, key: Array | None = None) -> Array:
    """Sample one token id from [vocab] f32 logits."""
    if cfg.is_greedy:
        return jnp.argmax(logits).astype(jnp.int32)
    assert key is not None, "stochastic sampling needs a PRNG key"
    logits = logits / jnp.float32(cfg.temperature)

    if cfg.top_k and cfg.top_k > 0:
        # a top_k >= vocab is a no-op, not an error (tiny test vocabs)
        k = min(cfg.top_k, logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][-1]
        logits = jnp.where(logits < kth, -jnp.inf, logits)

    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits)[::-1]
        probs = jax.nn.softmax(sorted_logits)
        cum = jnp.cumsum(probs)
        # keep the smallest prefix with cumulative mass >= top_p
        cutoff_idx = jnp.sum(cum < cfg.top_p)
        cutoff = sorted_logits[jnp.minimum(cutoff_idx, logits.shape[0] - 1)]
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)

    return jax.random.categorical(key, logits).astype(jnp.int32)
