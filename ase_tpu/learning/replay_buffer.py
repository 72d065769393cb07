"""Fixed-size device-resident replay buffer (reference learning/replay_buffer.py).

A flat ring buffer over a single feature tensor, stored on device and
manipulated inside jit (masked dynamic writes). Sampling follows the
reference's shuffled-cursor scheme (replay_buffer.py:51-75): a persistent
random permutation is consumed in order — no sample repeats until the whole
buffer has been visited — and reshuffled on exhaustion. ``sample`` (uniform
with replacement) remains for callers that don't thread buffer state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    data: jnp.ndarray        # (capacity, dim)
    head: jnp.ndarray        # scalar int32 — next write position
    total_count: jnp.ndarray # scalar int32 — total stored ever
    perm: jnp.ndarray        # (capacity,) int32 — shuffled sampling order
    cursor: jnp.ndarray      # scalar int32 — next position in perm

    @staticmethod
    def create(capacity: int, dim: int, dtype=jnp.float32) -> "ReplayBuffer":
        return ReplayBuffer(
            data=jnp.zeros((capacity, dim), dtype),
            head=jnp.asarray(0, jnp.int32),
            total_count=jnp.asarray(0, jnp.int32),
            perm=jnp.arange(capacity, dtype=jnp.int32),
            cursor=jnp.asarray(0, jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    def store(self, batch: jnp.ndarray, mask=None) -> "ReplayBuffer":
        """Write `batch` rows at the ring head; `mask` selects valid rows
        (invalid rows are skipped by compacting valid rows to the front)."""
        n = batch.shape[0]
        if mask is not None:
            # stable-compact valid rows to the front; invalid rows overwrite
            # slots that will be re-claimed by the head not advancing past them
            order = jnp.argsort(~mask)  # valid rows first
            batch = batch[order]
            n_valid = jnp.sum(mask).astype(jnp.int32)
        else:
            n_valid = jnp.asarray(n, jnp.int32)
        idx = (self.head + jnp.arange(n)) % self.capacity
        write_mask = jnp.arange(n) < n_valid
        data = self.data.at[idx].set(
            jnp.where(write_mask[:, None], batch, self.data[idx])
        )
        return self.replace(
            data=data,
            head=(self.head + n_valid) % self.capacity,
            total_count=self.total_count + n_valid,
        )

    def sample(self, rng: jax.Array, n: int) -> jnp.ndarray:
        limit = jnp.clip(self.total_count, 1, self.capacity)
        idx = jax.random.randint(rng, (n,), 0, limit)
        return self.data[idx]

    def sample_cursor(self, rng: jax.Array, n: int):
        """No-replacement sampling via a persistent shuffled cursor
        (reference replay_buffer.py:51-75). Returns (new_buffer, rows).
        Draws walk the stored permutation; when a call would run past the
        end, the permutation is reshuffled for subsequent calls (within a
        single call larger than the buffer, wraps reuse the old order).

        While the buffer is only partially full the capacity-sized
        permutation cannot index stored rows uniformly (perm % limit biases
        low indices whenever capacity % limit != 0), so we fall back to
        uniform sampling over the valid region — matching the reference's
        uniform draw over stored rows."""
        limit = jnp.clip(self.total_count, 1, self.capacity)
        pos = (self.cursor + jnp.arange(n, dtype=jnp.int32)) % self.capacity
        rng, k_uniform = jax.random.split(rng)
        full = self.total_count >= self.capacity
        idx = jnp.where(
            full,
            self.perm[pos],
            jax.random.randint(k_uniform, (n,), 0, limit),
        )
        exhausted = self.cursor + n >= self.capacity
        new_perm = jnp.where(
            exhausted,
            jax.random.permutation(rng, self.capacity).astype(jnp.int32),
            self.perm,
        )
        new_cursor = jnp.where(exhausted, 0, self.cursor + n).astype(jnp.int32)
        return self.replace(perm=new_perm, cursor=new_cursor), self.data[idx]
