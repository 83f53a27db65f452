"""Checkpoint / resume for solver states.

The reference's checkpointing is implicit (the solver/state split is a
resumable checkpoint, SURVEY.md §5.4; iteration can be driven manually via
the iterator protocol). Here every state *is* a pytree, so checkpointing is
literal serialization: `save_state` / `load_state` round-trip any solver
state through a single .npz file. `template` on load follows the standard
JAX pattern (structure comes from a freshly built state, values from disk).
For multi-host sharded states use orbax directly — states are ordinary
pytrees.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["save_state", "load_state", "resume"]


def save_state(path: str, state: Any) -> None:
    """Serialize a solver-state pytree to `path` (.npz)."""
    leaves = jax.tree_util.tree_leaves(state)
    np.savez(path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_state(path: str, template: Any) -> Any:
    """Restore a solver-state pytree saved by `save_state`. `template` is a
    structurally identical state (e.g. `solver.init(b)`)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = jax.tree_util.tree_flatten(template)
    restored = [
        jnp.asarray(data[f"leaf_{i}"], dtype=np.asarray(leaf).dtype)
        for i, leaf in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, restored)


def resume(solver, state):
    """Continue iterating a (possibly checkpointed) state until `done`;
    returns (solution, final_state)."""
    state = lax.while_loop(
        lambda s: jnp.logical_not(solver.done(s)), solver.step, state
    )
    state = solver.finalize(state)
    return solver.solution(state), state
