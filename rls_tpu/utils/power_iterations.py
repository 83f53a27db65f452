"""Spectral norm estimation of a normal operator via power iterations.

Reference: ``power_iterations`` (/root/reference/src/Utils.jl:245-287) —
used by FISTA/OptISTA/POGM to default the step size
``rho = 0.95 / power_iterations(AHA)`` (/root/reference/src/FISTA.jl:63).

JAX version: bounded `lax.while_loop` (converged-or-maxiter), deterministic
seed, jittable; runs fine with traced operators as well as eagerly at solver
construction time.
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["power_iterations"]


def power_iterations(
    AHA: Union[Callable, "object"],
    n: int | None = None,
    dtype=None,
    rtol: float = 1e-3,
    maxiter: int = 50,
    min_iter: int = 8,
    seed: int = 0,
):
    """Estimate the max eigenvalue of the (hermitian PSD) operator ``AHA``.

    ``AHA`` is a LinearOperator (uses .mv / .in_size / .dtype) or a callable
    ``x -> AHA x`` (then ``n`` and ``dtype`` must be given).
    """
    if callable(AHA) and not hasattr(AHA, "mv"):
        op = AHA
        if n is None:
            raise ValueError("power_iterations with a callable needs n=")
        dt = dtype or jnp.complex64
    else:
        op = AHA.mv
        n = AHA.in_size
        dt = dtype or AHA.dtype

    key = jax.random.PRNGKey(seed)
    if jnp.issubdtype(dt, jnp.complexfloating):
        rdt = jnp.float32 if dt == jnp.complex64 else jnp.float64
        b0 = (
            jax.random.normal(key, (n,), rdt)
            + 1j * jax.random.normal(jax.random.fold_in(key, 1), (n,), rdt)
        ).astype(dt)
    else:
        b0 = jax.random.normal(key, (n,), dt)

    rdtype = jnp.real(b0).dtype

    def cond(carry):
        _, lam, lam_old, i = carry
        # min_iter guard: when the random start is nearly orthogonal to the
        # dominant eigenvector, the estimate briefly stabilizes at a
        # SUBDOMINANT eigenvalue and an immediate rtol stop returns it —
        # which *under*estimates λmax and makes the 0.95/λmax default step
        # of FISTA/OptISTA/POGM divergent. A few mandatory sweeps let the
        # dominant component be amplified past any unlucky start.
        not_conv = jnp.abs(lam / lam_old - 1.0) >= rtol
        return jnp.logical_and(
            i < maxiter, jnp.logical_or(i < min_iter, not_conv)
        )

    def body(carry):
        b, lam, _, i = carry
        bn = b / jnp.linalg.norm(b)
        b_new = op(bn)
        lam_new = jnp.abs(jnp.vdot(bn, b_new)).astype(rdtype)
        return (b_new, lam_new, lam, i + 1)

    init = (b0, jnp.asarray(jnp.inf, rdtype), jnp.asarray(1.0, rdtype), 0)
    # one unconditional iteration so lam is finite before the rtol test
    init = body(init)
    _, lam, _, _ = lax.while_loop(cond, body, init)
    return lam
