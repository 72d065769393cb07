"""Running mean/std normalizer as a pytree (rl_games RunningMeanStd parity).

The reference normalizes policy observations, AMP observations and value
targets with rl_games' RunningMeanStd (updated only in train mode —
``amp_agent.py:35-45``). Here the statistics are explicit pytree state
threaded through the jitted train step; `normalize(..., update=True)` returns
the updated stats alongside the normalized batch.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # scalar

    @staticmethod
    def create(shape) -> "RunningMeanStd":
        return RunningMeanStd(
            mean=jnp.zeros(shape), var=jnp.ones(shape),
            count=jnp.asarray(1e-4, jnp.float32),
        )

    def update(self, batch: jnp.ndarray) -> "RunningMeanStd":
        """Chan-style parallel moment merge over the leading axis."""
        batch = batch.reshape(-1, *self.mean.shape)
        b_mean = jnp.mean(batch, axis=0)
        b_var = jnp.var(batch, axis=0)
        b_count = jnp.asarray(batch.shape[0], jnp.float32)

        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        M2 = m_a + m_b + jnp.square(delta) * self.count * b_count / tot
        return RunningMeanStd(mean=new_mean, var=M2 / tot, count=tot)

    def normalize(self, x: jnp.ndarray, clip: float = 5.0) -> jnp.ndarray:
        y = (x - self.mean) / jnp.sqrt(self.var + 1e-5)
        return jnp.clip(y, -clip, clip)

    def denormalize(self, y: jnp.ndarray) -> jnp.ndarray:
        return y * jnp.sqrt(self.var + 1e-5) + self.mean
