"""POGM — proximal optimized gradient method (Taylor et al. 2017,
Kim & Fessler 2018) with optional gradient restart and σ decrease.

Behavioral port of /root/reference/src/POGM.jl.
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

__all__ = ["POGM"]


@pytree_dataclass
class POGMState:
    x: Any
    x0hat: Any
    y: Any
    z: Any
    w: Any
    rho: Any
    theta: Any
    gamma: Any
    sigma: Any
    norm_x0: Any
    rel_res_norm: Any
    lam_scale: Any
    rel_tol: Any
    iteration: Any


@pytree_dataclass
class POGM(LinearSolver):
    A: Optional[LinearOperator]
    AHA: LinearOperator
    reg: Any
    proj: Tuple = ()
    rho: Any = 1.0
    theta: Any = 1.0
    sigma_fac: Any = 1.0
    rel_tol: Any = None
    normalize_reg: Any = NoNormalization()
    iterations: int = static_field(default=50)
    restart: str = static_field(default="none")
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
        sigma_fac=1.0,
        rel_tol=None,
        restart: str = "none",
        verbose: bool = False,
        **_,
    ):
        A_op, AHA_op = prepare_operators(A, AHA)
        if reg is None:
            reg = L1Regularization(0.0)
        params, proj = split_projection_terms(reg)
        if len(params) != 1:
            raise ValueError(
                f"POGM does not allow more additional regularization terms, "
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
            sigma_fac=sigma_fac,
            rel_tol=rel_tol,
            normalize_reg=normalize_reg,
            iterations=iterations,
            restart=restart,
            verbose=verbose,
        )

    def init(self, b, x0=None) -> POGMState:
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
        zeros = jnp.zeros_like(x)
        return POGMState(
            x=x,
            x0hat=x0hat,
            y=zeros,
            z=zeros,
            w=zeros,
            rho=jnp.asarray(self.rho, rdt),
            theta=jnp.asarray(self.theta, rdt),
            gamma=jnp.asarray(1.0, rdt),
            sigma=jnp.asarray(1.0, rdt),
            norm_x0=norm_x0,
            rel_res_norm=jnp.asarray(jnp.inf, rdt),
            lam_scale=scale,
            rel_tol=rel_tol,
            iteration=jnp.asarray(0, jnp.int32),
        )

    def step(self, state: POGMState) -> POGMState:
        rdt = state.rho.dtype

        # gradient step (reference POGM.jl:180-183)
        x_old = state.x
        res = self.AHA.mv(state.x) - state.x0hat
        cdt = res.dtype
        x = state.x - state.rho.astype(cdt) * res
        rel_res = jnp.linalg.norm(res) / state.norm_x0

        # inertial parameters (POGM.jl:189-202)
        theta_old = state.theta
        last = state.iteration == self.iterations - 1
        if self.restart != "none":
            theta = jnp.where(
                last,
                (1.0 + jnp.sqrt(1.0 + 8.0 * theta_old**2)) / 2.0,
                (1.0 + jnp.sqrt(1.0 + 4.0 * theta_old**2)) / 2.0,
            )
        else:
            theta = (1.0 + jnp.sqrt(1.0 + 4.0 * theta_old**2)) / 2.0
        alpha = (theta_old - 1.0) / theta
        beta = state.sigma * theta_old / theta
        gamma_old = state.gamma
        if self.restart == "gradient":
            gamma = state.rho * (1.0 + alpha + beta)
        else:
            gamma = state.rho * (2.0 * theta_old + theta - 1.0) / theta

        # inertia steps (POGM.jl:205-213)
        y_old = state.y
        y = x
        x = (
            (1.0 + alpha + beta).astype(cdt) * y
            - alpha.astype(cdt) * y_old
            - (beta + state.rho * alpha / gamma_old).astype(cdt) * x_old
            + (state.rho * alpha / gamma_old).astype(cdt) * state.z
        )
        z = x

        # proximal map (POGM.jl:216-219)
        lam_eff = self.reg.get_lam() * state.lam_scale
        x = self.reg.prox(x, gamma * lam_eff)
        for p in self.proj:
            x = p.prox(x)

        # gradient restart (POGM.jl:222-232)
        sigma = state.sigma
        w = state.w
        if self.restart == "gradient":
            w = w + y + (state.rho / gamma).astype(cdt) * (x - z)
            crit = jnp.real(
                (jnp.vdot(w, x) - jnp.vdot(w, z)) / gamma.astype(cdt)
                - jnp.vdot(w, res)
            )
            restart_now = crit < 0
            sigma = jnp.where(restart_now, jnp.asarray(1.0, rdt), sigma * self.sigma_fac)
            theta = jnp.where(restart_now, jnp.asarray(1.0, rdt), theta)
            w = (state.rho / gamma).astype(cdt) * (z - x) - y

        return replace(
            state,
            x=x,
            y=y,
            z=z,
            w=w,
            theta=theta,
            gamma=gamma,
            sigma=sigma,
            rel_res_norm=rel_res,
            iteration=state.iteration + 1,
        )

    def done(self, state: POGMState):
        converged = state.rel_res_norm < state.rel_tol
        return jnp.logical_or(converged, state.iteration >= self.iterations)

    def convergence(self, state: POGMState) -> dict:
        return {"residual": state.rel_res_norm * state.norm_x0}
