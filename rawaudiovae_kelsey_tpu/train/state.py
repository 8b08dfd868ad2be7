"""Train state: one pytree carried through the jitted step.

The reference kept model params, Adam state, and the epoch counter in three
mutable Python objects (model / optimizer / loop variable, train.py:158-171);
here they travel together as a single donated pytree so the whole update is
in-place on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    rng: jax.Array      # base threefry key; folded with step per update
    step: jax.Array     # int32 scalar, counts optimizer updates

    @classmethod
    def create(cls, params: Any, opt_state: Any, seed: int) -> "TrainState":
        return cls(
            params=params,
            opt_state=opt_state,
            rng=jax.random.PRNGKey(seed),
            step=jnp.zeros((), jnp.int32),
        )
