"""Tiny-matrix batched linear algebra, unrolled for TPU.

XLA's `linalg.solve` lowers to an LU custom call that loops over columns with
dynamic slices — milliseconds per call for (K·A, 9, 9) batches, which would
dominate the physics substep. The articulation mass matrices here are SPD and
tiny (nv ≤ ~18, static), so an UNROLLED Cholesky factor + triangular solves
compile to ~n³/3 fused elementwise ops over the batch: no custom call, no
loop, fully fuseable with the surrounding substep.
"""
from __future__ import annotations

import jax.numpy as jnp


def solve_psd_multi(M: jnp.ndarray, B: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Solve M X = B for SPD M with multiple right-hand sides.
    M: (..., n, n), B: (..., n, m) → X: (..., n, m). Column-wise solve_psd;
    the unrolled factor subexpressions are identical across columns so XLA
    CSEs them into one factorization."""
    m = B.shape[-1]
    cols = [solve_psd(M, B[..., j]) for j in range(m)]
    return jnp.stack(cols, axis=-1)


def solve_psd(M: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Solve M x = b for SPD M. M: (..., n, n), b: (..., n); n static ≤ ~32."""
    n = M.shape[-1]
    # Cholesky (Cholesky–Banachiewicz), unrolled; L stored as n(n+1)/2 batch arrays
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = M[..., j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(d, eps))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    # forward substitution: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution: Lᵀ x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
