"""Micro-bench: contact feature stack + one-hot selection einsum variants.

The narrow phase builds a (B, 10, C) channel stack (depth, pos, normal, mu,
body ids) and contracts it with the (B, K, C) selection one-hot
(collision3.py). The jnp.stack(axis=1) form lowers to a concatenate of
(B, 1, C) slices — single-sublane writes with ~8x write amplification
(trace: 0.26 ms/call at B=4096, C=367, plus T(1,128) feeder copies).
This script times the isolated build+select for candidate layouts on the
real chip.

Usage: python scripts/bench_featsel.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp

B, C, K, F = 4096, 367, 24, 10


def make_inputs(key):
    ks = jax.random.split(key, F + 1)
    chans = [jax.random.normal(ks[i], (B, C)) for i in range(F)]
    onehot = (
        jax.random.uniform(ks[F], (B, K, C)) > 0.97
    ).astype(jnp.float32)
    return chans, onehot


def sel_einsum(onehot, feats):
    return jnp.einsum(
        "bkc,bfc->bfk", onehot, feats, precision=jax.lax.Precision.HIGHEST
    )


def v0_stack1(chans, onehot):
    feats = jnp.stack(chans, axis=1)                     # (B, F, C)
    return sel_einsum(onehot, feats)


def v1_stack0_moveaxis(chans, onehot):
    feats = jnp.moveaxis(jnp.stack(chans, axis=0), 0, 1)  # one clean relayout
    return sel_einsum(onehot, feats)


def v2_concat_reshape(chans, onehot):
    feats = jnp.concatenate(chans, axis=1).reshape(B, F, C)
    return sel_einsum(onehot, feats)


def v3_stack0_einsum(chans, onehot):
    feats = jnp.stack(chans, axis=0)                     # (F, B, C)
    return jnp.einsum(
        "bkc,fbc->bfk", onehot, feats, precision=jax.lax.Precision.HIGHEST
    )


def v4_chan_last(chans, onehot):
    feats = jnp.stack(chans, axis=2)                     # (B, C, F)
    return jnp.einsum(
        "bkc,bcf->bfk", onehot, feats, precision=jax.lax.Precision.HIGHEST
    )


def main():
    key = jax.random.PRNGKey(0)
    chans, onehot = make_inputs(key)
    chans = [jax.device_put(c) for c in chans]
    onehot = jax.device_put(onehot)

    variants = [
        ("v0 stack(axis=1)        ", v0_stack1),
        ("v1 stack(0)+moveaxis    ", v1_stack0_moveaxis),
        ("v2 concat(ax1)+reshape  ", v2_concat_reshape),
        ("v3 stack(0), fbc einsum ", v3_stack0_einsum),
        ("v4 stack(ax2), bcf einsum", v4_chan_last),
    ]
    jfns = []
    ref = None
    for name, fn in variants:
        jfn = jax.jit(fn)
        out = jfn(chans, onehot)
        jax.block_until_ready(out)
        if ref is None:
            ref = out
        else:
            err = float(jnp.max(jnp.abs(out - ref)))
            assert err == 0.0, f"{name}: mismatch {err}"
        jfns.append((name, jfn))

    # interleaved repetitions (3 passes, min-of-pass) to wash out order and
    # queue-depth artifacts; each pass times n back-to-back dispatches
    best = {name: float("inf") for name, _ in jfns}
    for _ in range(3):
        for name, jfn in jfns:
            n = 50
            out = jfn(chans, onehot)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(n):
                out = jfn(chans, onehot)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / n * 1e3
            best[name] = min(best[name], dt)
    for name, _ in jfns:
        print(f"{name}: {best[name]:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
