"""Unrolled Cholesky solves for tiny fixed-size SPD systems.

`jnp.linalg.solve` lowers to an LU custom call with large fixed overhead on
TPU — prohibitive inside the tracking LM loop, which solves one 6x6 system
per iteration (40 iterations/frame). Unrolling the factorization into ~150
scalar ops lets XLA fuse the entire solve into the surrounding kernel: no
custom call, no dispatch, effectively free next to the residual reduction.

Python loops here unroll at trace time (n is a static int)."""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_solve_small(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for SPD A of small static size n (n <= ~12 sensible).

    A: (n, n) symmetric positive definite (caller adds damping).
    b: (n,). Returns x: (n,)."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)
