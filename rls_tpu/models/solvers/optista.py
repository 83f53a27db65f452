"""OptISTA — optimal ISTA (Jang, Das Gupta, Ryu 2023).

Behavioral port of /root/reference/src/OptISTA.jl. The θ-schedule depends on
the total iteration count (θn pre-computed at init, OptISTA.jl:145-149);
2 extra image-sized state vectors vs FISTA.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp

from ..._pytree import pytree_dataclass, replace, static_field
from ...ops.base import LinearOperator
from ...utils.power_iterations import power_iterations
from ..prox import L1Regularization
from ..regularization import NoNormalization, normalization_factor
from .base import LinearSolver, prepare_operators, split_projection_terms

__all__ = ["OptISTA"]


@pytree_dataclass
class OptISTAState:
    x: Any
    x0hat: Any
    y: Any
    z: Any
    z_old: Any
    rho: Any
    theta: Any
    theta_n: Any
    norm_x0: Any
    rel_res_norm: Any
    lam_scale: Any
    rel_tol: Any
    iteration: Any


@pytree_dataclass
class OptISTA(LinearSolver):
    A: Optional[LinearOperator]
    AHA: LinearOperator
    reg: Any
    proj: Tuple = ()
    rho: Any = 1.0
    theta: Any = 1.0
    rel_tol: Any = None
    normalize_reg: Any = NoNormalization()
    iterations: int = static_field(default=50)
    verbose: bool = static_field(default=False)

    @classmethod
    def create(
        cls,
        A=None,
        AHA=None,
        reg=None,
        normalize_reg=NoNormalization(),
        iterations: int = 50,
        rho=None,
        theta=1.0,
        rel_tol=None,
        verbose: bool = False,
        **_,
    ):
        A_op, AHA_op = prepare_operators(A, AHA)
        if reg is None:
            reg = L1Regularization(0.0)
        params, proj = split_projection_terms(reg)
        if len(params) != 1:
            raise ValueError(
                f"OptISTA does not allow more additional regularization terms, "
                f"found {len(params)}"
            )
        if rho is None:
            rho = 0.95 / power_iterations(AHA_op)
        return cls(
            A=A_op,
            AHA=AHA_op,
            reg=params[0],
            proj=proj,
            rho=rho,
            theta=theta,
            rel_tol=rel_tol,
            normalize_reg=normalize_reg,
            iterations=iterations,
            verbose=verbose,
        )

    def _theta_n(self, rdt):
        """Final θn of the schedule (reference OptISTA.jl:145-149)."""
        tn = jnp.asarray(self.theta, rdt)
        for _ in range(self.iterations - 1):
            tn = (1.0 + jnp.sqrt(1.0 + 4.0 * tn**2)) / 2.0
        return (1.0 + jnp.sqrt(1.0 + 8.0 * tn**2)) / 2.0

    def init(self, b, x0=None) -> OptISTAState:
        b = jnp.asarray(b)
        x0hat = self.A.rmv(b) if self.A is not None else b
        n = x0hat.shape[0]
        if x0 is not None:
            x = jnp.broadcast_to(jnp.asarray(x0, x0hat.dtype), (n,))
        else:
            x = jnp.zeros((n,), x0hat.dtype)
        norm_x0 = jnp.linalg.norm(x0hat)
        rdt = norm_x0.dtype
        rel_tol = (
            jnp.asarray(self.rel_tol, rdt)
            if self.rel_tol is not None
            else jnp.asarray(jnp.finfo(rdt).eps, rdt)
        )
        scale = normalization_factor(self.normalize_reg, self.A, b).astype(rdt)
        return OptISTAState(
            x=x,
            x0hat=x0hat,
            y=x,
            z=x,
            z_old=x,
            rho=jnp.asarray(self.rho, rdt),
            theta=jnp.asarray(self.theta, rdt),
            theta_n=self._theta_n(rdt),
            norm_x0=norm_x0,
            rel_res_norm=jnp.asarray(jnp.inf, rdt),
            lam_scale=scale,
            rel_tol=rel_tol,
            iteration=jnp.asarray(0, jnp.int32),
        )

    def step(self, state: OptISTAState) -> OptISTAState:
        # inertial parameters (reference OptISTA.jl:168-176)
        theta = state.theta
        gamma = 2.0 * theta / state.theta_n**2 * (state.theta_n**2 - 2.0 * theta**2 + theta)
        theta_old = theta
        last = state.iteration == self.iterations - 1
        theta_new = jnp.where(
            last,
            (1.0 + jnp.sqrt(1.0 + 8.0 * theta_old**2)) / 2.0,
            (1.0 + jnp.sqrt(1.0 + 4.0 * theta_old**2)) / 2.0,
        )
        alpha = (theta_old - 1.0) / theta_new
        beta = theta_old / theta_new

        # gradient step on y (OptISTA.jl:180-184)
        z_old = state.z
        y_old = state.y
        res = self.AHA.mv(state.x) - state.x0hat
        cdt = res.dtype
        y = state.y - (state.rho * gamma).astype(cdt) * res
        rel_res = jnp.linalg.norm(res) / state.norm_x0

        # proximal map (OptISTA.jl:190)
        lam_eff = self.reg.get_lam() * state.lam_scale
        y = self.reg.prox(y, state.rho * gamma * lam_eff)

        # inertia (OptISTA.jl:193-199): z = x + (y − yᵒˡᵈ)/γ;
        # x = z + α(z − zᵒˡᵈ) + β(z − x)
        z = state.x + (y - y_old) / gamma.astype(cdt)
        x = (
            (1.0 + alpha + beta).astype(cdt) * z
            - alpha.astype(cdt) * z_old
            - beta.astype(cdt) * state.x
        )

        return replace(
            state,
            x=x,
            y=y,
            z=z,
            z_old=z_old,
            theta=theta_new,
            rel_res_norm=rel_res,
            iteration=state.iteration + 1,
        )

    def done(self, state: OptISTAState):
        converged = state.rel_res_norm < state.rel_tol
        return jnp.logical_or(converged, state.iteration >= self.iterations)

    def convergence(self, state: OptISTAState) -> dict:
        return {"residual": state.rel_res_norm * state.norm_x0}
