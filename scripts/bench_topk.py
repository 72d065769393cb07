"""Microbench: top-k selection strategies for contact pruning on TPU.

The collision narrow-phase keeps the k deepest of C candidate contacts
(collision3.py:489-518). Compares argsort-select (current), lax.top_k,
approx_max_k, and iterative max at the production shape (4096, 367), k=24.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=50, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000.0


def main():
    B, C, k = 4096, 367, 24
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C))

    @jax.jit
    def via_argsort(d):
        return jnp.argsort(-d, axis=1)[:, :k]

    @jax.jit
    def via_topk(d):
        return jax.lax.top_k(d, k)[1]

    @jax.jit
    def via_approx(d):
        return jax.lax.approx_max_k(d, k, recall_target=0.99,
                                    aggregate_to_topk=True)[1]

    @jax.jit
    def via_itermax(d):
        idxs = []
        dd = d
        ar = jnp.arange(C)[None, :]
        for _ in range(k):
            i = jnp.argmax(dd, axis=1)
            idxs.append(i)
            dd = jnp.where(ar == i[:, None], -jnp.inf, dd)
        return jnp.stack(idxs, axis=1)

    for name, fn in [("argsort", via_argsort), ("top_k", via_topk),
                     ("approx_max_k", via_approx), ("iter_max", via_itermax)]:
        try:
            t = timeit(fn, x)
            # correctness vs argsort (as a set)
            ref = set(map(tuple, jax.device_get(jnp.sort(via_argsort(x), axis=1))[:8]))
            got = set(map(tuple, jax.device_get(jnp.sort(fn(x), axis=1))[:8]))
            ok = "exact" if ref == got else "DIFFERS"
            print(f"{name:14s} {t:7.3f} ms   {ok}")
        except Exception as e:
            print(f"{name:14s} FAILED: {e}")


if __name__ == "__main__":
    main()
