"""Correctness + timing of the fused Pallas chol kernels on TPU."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

from ase_tpu.ops import pallas_chol


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000.0


def main():
    print("backend:", jax.default_backend())
    n, m, B = 37, 73, 4096
    rng = np.random.RandomState(0)
    Ms = rng.randn(B, n, n).astype(np.float32)
    Ms = Ms @ np.transpose(Ms, (0, 2, 1)) + 5 * np.eye(n)[None]
    M_bl = jnp.asarray(np.transpose(Ms, (1, 2, 0)))
    rhs = jnp.asarray(np.transpose(rng.randn(B, n, m).astype(np.float32), (1, 2, 0)))

    # XLA reference
    L_x, Y_x = jax.jit(pallas_chol._chol_forward_xla)(M_bl, rhs)
    x_x = jax.jit(pallas_chol._back_solve_xla)(L_x, Y_x)

    # Pallas
    L_p, Y_p = pallas_chol._chol_forward_pallas(M_bl, rhs)
    x_p = pallas_chol._back_solve_pallas(L_p, Y_p)

    for name, a, b in [("L", L_x, L_p), ("Y", Y_x, Y_p), ("x", x_x, x_p)]:
        a, b = np.asarray(a), np.asarray(b)
        if name == "L":
            a, b = np.tril(a.transpose(2, 0, 1)), np.tril(b.transpose(2, 0, 1))
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        print(f"{name}: rel err {err:.2e}")

    # split-rhs variant (engine passes the Jacobian block and the tau-bias
    # column as separate operands): parity vs the concatenated run
    L_2, Ya, Yb = pallas_chol._chol_forward2_pallas(
        M_bl, rhs[:, :-1], rhs[:, -1:])
    err2 = np.max(np.abs(np.concatenate(
        [np.asarray(Ya), np.asarray(Yb)], axis=1) - np.asarray(Y_p)))
    print(f"split-rhs Y: abs err {err2:.2e}")

    t_xla = timeit(jax.jit(lambda M, r: pallas_chol._chol_forward_xla(M, r)), M_bl, rhs)
    t_pal = timeit(pallas_chol._chol_forward_pallas, M_bl, rhs)
    t_pal2 = timeit(pallas_chol._chol_forward2_pallas, M_bl, rhs[:, :-1], rhs[:, -1:])
    print(f"chol_forward: xla {t_xla:.3f} ms  pallas {t_pal:.3f} ms  "
          f"pallas-split {t_pal2:.3f} ms")
    y1 = Y_x[:, :1, :]
    t_xla_b = timeit(jax.jit(lambda L, y: pallas_chol._back_solve_xla(L, y)), L_x, y1)
    t_pal_b = timeit(pallas_chol._back_solve_pallas, L_p, y1)
    print(f"back_solve(m=1): xla {t_xla_b:.3f} ms  pallas {t_pal_b:.3f} ms")


if __name__ == "__main__":
    main()
