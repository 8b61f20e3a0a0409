"""Linear (kernel) PCA and least-squares circle fitting.

Replaces at the reference's 2D-projection stage:
  * sklearn.decomposition.KernelPCA(n_components=2) with the default linear
    kernel (mesh_processing.py:482-487) -> eigendecomposition of the centered
    Gram matrix, with sklearn's deterministic sign convention;
  * scipy.optimize.leastsq circle fit with analytic Jacobian
    (mesh_processing.py:411-444) -> Gauss-Newton iterations in JAX (same
    objective: residual r_i - mean(r), seeded at the centroid).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def linear_kpca(x: np.ndarray, n_components: int = 2) -> np.ndarray:
    """Project points onto their top principal components (equivalent to
    linear-kernel KernelPCA scores)."""
    x = np.asarray(x, np.float64)
    xc = x - x.mean(axis=0)
    # SVD of the centered data == eigendecomposition of the Gram matrix
    u, s, vt = np.linalg.svd(xc, full_matrices=False)
    scores = u[:, :n_components] * s[:n_components]
    # deterministic signs (sklearn svd_flip): largest-|.| entry of each u
    # column made positive
    for j in range(scores.shape[1]):
        col = u[:, j]
        if col[np.argmax(np.abs(col))] < 0:
            scores[:, j] = -scores[:, j]
    return scores.astype(np.float32)


@partial(jax.jit, static_argnames=("n_iter",))
def _circle_fit_impl(x, y, n_iter: int):
    """Minimize sum_i (r_i(c) - mean(r(c)))^2 by Gauss-Newton."""

    def residual(c):
        r = jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2)
        return r - jnp.mean(r)

    def step(_, c):
        f = residual(c)
        jac = jax.jacfwd(residual)(c)  # (n, 2)
        jtj = jac.T @ jac + 1e-12 * jnp.eye(2)
        jtf = jac.T @ f
        return c - jnp.linalg.solve(jtj, jtf)

    c0 = jnp.array([jnp.mean(x), jnp.mean(y)])
    c = jax.lax.fori_loop(0, n_iter, step, c0)
    r = jnp.mean(jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2))
    return c, r


def compute_least_square_circle(x: np.ndarray, y: np.ndarray):
    """Returns (center (2,), radius) — reference mesh_processing.py:411-444."""
    c, r = _circle_fit_impl(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32), 20
    )
    return np.asarray(c), float(r)
