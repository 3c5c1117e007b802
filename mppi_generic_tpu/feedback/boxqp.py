"""Box-constrained QP solver — parity with the reference's projected-Newton
``BoxQP`` (ddp/boxqp.h:79-296), used by the DDP backward pass to solve

    min_u  0.5 u^T H u + g^T u    s.t.  lb <= u <= ub

per timestep. The reference's algorithm: clamp, detect the active set
(x at a bound with the gradient pushing outward, boxqp.h:140-146), factorize
the free-free block, take a Newton step on the free dims with Armijo
backtracking, repeat until the gradient is small.

TPU-native formulation with static shapes: instead of dynamically-sized
free-block factorizations, the clamped rows/columns of H are masked to the
identity and the clamped gradient entries zeroed, so a full-size solve
yields the free-subspace Newton step (clamped dims move 0). A fixed
iteration count replaces the convergence loop (lax.scan), and the Armijo
backtracking becomes an argmin over a step ladder — same fixed-point, XLA-
friendly control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def boxqp(H, g, lb, ub, x0=None, max_iter: int = 8, n_steps: int = 10):
    """Solve min 0.5 x^T H x + g^T x, lb <= x <= ub.

    Returns (x, free_mask) where free_mask marks the final inactive
    dimensions (the reference returns the free-set factorization for the
    gain computation, boxqp.h:45-52)."""
    n = g.shape[0]
    if x0 is None:
        x0 = jnp.zeros_like(g)
    x0 = jnp.clip(x0, lb, ub)
    alphas = jnp.power(0.5, jnp.arange(n_steps, dtype=jnp.float32))

    def objective(x):
        return 0.5 * x @ H @ x + g @ x

    def body(x, _):
        grad = g + H @ x
        clamped = ((x <= lb) & (grad > 0)) | ((x >= ub) & (grad < 0))
        free = (~clamped).astype(jnp.float32)
        # masked Newton system: free block of H, identity on clamped dims
        Hm = H * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        dx = -jnp.linalg.solve(Hm, grad * free)
        cands = jnp.clip(x[None, :] + alphas[:, None] * dx[None, :], lb, ub)
        vals = jax.vmap(objective)(cands)
        best = cands[jnp.argmin(vals)]
        x_new = jnp.where(jnp.min(vals) < objective(x), best, x)
        return x_new, None

    x, _ = jax.lax.scan(body, x0, None, length=max_iter)
    grad = g + H @ x
    clamped = ((x <= lb) & (grad > 0)) | ((x >= ub) & (grad < 0))
    return x, ~clamped


def boxqp_gains(H, Qux, free_mask):
    """Feedback gains consistent with the active set: rows of K for clamped
    controls are zero; free rows solve the masked system
    K_free = -H_ff^{-1} Qux_free (the reference back-substitutes through the
    free-set Cholesky, ddp.h backward pass)."""
    free = free_mask.astype(jnp.float32)
    Hm = H * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
    K = -jnp.linalg.solve(Hm, Qux * free[:, None])
    return K
