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

    def _ring_write(self, rows: jnp.ndarray, n_valid) -> "ReplayBuffer":
        """Write the first `n_valid` of `rows` at the ring head (rows past
        n_valid re-write their slot's old contents, so the head not advancing
        past them re-claims the space)."""
        n = rows.shape[0]
        idx = (self.head + jnp.arange(n)) % self.capacity
        write_mask = jnp.arange(n) < n_valid
        data = self.data.at[idx].set(
            jnp.where(write_mask[:, None], rows, self.data[idx])
        )
        return self.replace(
            data=data,
            head=(self.head + n_valid) % self.capacity,
            total_count=self.total_count + n_valid,
        )

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
        return self._ring_write(batch, n_valid)

    def store_compact(self, batch: jnp.ndarray, mask: jnp.ndarray,
                      k_max: int) -> "ReplayBuffer":
        """``store(batch, mask)`` that only MOVES ``k_max`` rows.

        Bit-identical to ``store(batch, mask=mask)`` whenever
        ``sum(mask) <= k_max`` (same stable first-valid-rows order, same head
        advance); rows past the k_max-th valid one are dropped. The masked
        ``store`` path gathers/scatters all ``len(batch)`` rows — at AMP's
        1%-keep replay write that is ~2 GB of HBM traffic to store ~1.3k
        rows. Here: one int32 rank scatter + a k_max-row gather + a
        k_max-row ring write."""
        n = batch.shape[0]
        mask = mask.astype(bool)
        rank = jnp.cumsum(mask) - 1  # stable compaction rank of each valid row
        slot = jnp.where(mask & (rank < k_max), rank, k_max)  # k_max = spill
        row_idx = (
            jnp.zeros((k_max + 1,), jnp.int32)
            .at[slot].set(jnp.arange(n, dtype=jnp.int32))[:k_max]
        )
        n_valid = jnp.minimum(jnp.sum(mask), k_max).astype(jnp.int32)
        # unfilled slots hold row 0 — masked off by the ring write's
        # arange < n_valid guard, so the stale gather is harmless
        return self._ring_write(batch[row_idx], n_valid)

    def sample(self, rng: jax.Array, n: int) -> jnp.ndarray:
        limit = jnp.clip(self.total_count, 1, self.capacity)
        idx = jax.random.randint(rng, (n,), 0, limit)
        return self.data[idx]

    def sample_cursor(self, rng: jax.Array, n: int):
        """No-replacement sampling via a persistent shuffled cursor
        (reference replay_buffer.py:51-75). Returns (new_buffer, rows)."""
        buf, idx = self.sample_cursor_idx(rng, n)
        return buf, self.data[idx]

    def sample_cursor_idx(self, rng: jax.Array, n: int):
        """``sample_cursor`` without the row gather: returns
        (new_buffer, idx) so callers that only consume a few rows at a time
        (the AMP minibatch loop) can gather them lazily instead of
        materializing an (n, dim) sample tensor.

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
        return self.replace(perm=new_perm, cursor=new_cursor), idx
