"""BiCGSTAB solver — nonsymmetric systems over the framework matvecs.

Complements :mod:`.cg` (which requires SPD): the suite's nonsymmetric
regimes (power-law web, road networks, general banded —
models/synthetic.py) need a Krylov method without the symmetry
assumption. Same design rules as ``cg``: the whole iteration is one
``lax.while_loop`` under ``jit`` — two matvecs plus vector updates per
step, no host round-trips, static shapes (docs/DESIGN.md XLA semantics).

Algorithm: van der Vorst's BiCGSTAB with the standard rho/omega
breakdown guards (iteration stops by flag when |rho| or |omega|
underflows — returned residual tells the caller).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["bicgstab"]

_EPS = 1e-30


@functools.partial(jax.jit, static_argnames=("matvec", "maxiter"))
def bicgstab(matvec: Callable, b, x0=None, *, tol: float = 1e-6,
             maxiter: int = 1000):
    """Solve ``A @ x = b`` for general (nonsymmetric) ``A``.

    Returns ``(x, iters, resnorm)``; stops at ``||r|| <= tol * ||b||``,
    ``maxiter``, or numerical breakdown (stagnating rho/omega).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    bnorm = jnp.sqrt(jnp.vdot(b, b).real)
    atol2 = (tol * bnorm) ** 2

    r0 = b - matvec(x0)
    rhat = r0  # shadow residual, fixed
    state0 = (x0, r0, r0, jnp.vdot(rhat, r0).real,  # x, r, p, rho
              jnp.vdot(r0, r0).real, 0, False)       # rs, k, broke

    def cond(state):
        _, _, _, _, rs, k, broke = state
        return jnp.logical_and(k < maxiter,
                               jnp.logical_and(rs > atol2, ~broke))

    def body(state):
        x, r, p, rho, _, k, _ = state
        v = matvec(p)
        denom = jnp.vdot(rhat, v).real
        alpha = rho / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
        s = r - alpha * v
        t = matvec(s)
        tt = jnp.vdot(t, t).real
        omega = jnp.vdot(t, s).real / jnp.where(tt < _EPS, _EPS, tt)
        x = x + alpha * p + omega * s
        r = s - omega * t
        rho_new = jnp.vdot(rhat, r).real
        beta = (rho_new / jnp.where(jnp.abs(rho) < _EPS, _EPS, rho)) * \
            (alpha / jnp.where(jnp.abs(omega) < _EPS, _EPS, omega))
        p = r + beta * (p - omega * v)
        broke = jnp.logical_or(jnp.abs(rho_new) < _EPS,
                               jnp.abs(omega) < _EPS)
        rs = jnp.vdot(r, r).real
        return x, r, p, rho_new, rs, k + 1, broke

    x, r, _, _, rs, k, _ = jax.lax.while_loop(cond, body, state0)
    return x, k, jnp.sqrt(rs)
