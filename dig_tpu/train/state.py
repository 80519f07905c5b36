"""Functional train state: params, EMA params, optimizer state, step.

Replaces the reference's mutable module + optimizer + AMP GradScaler
bundle (utils/utils.py:477-504; there is no loss scaling on TPU — bf16
needs none).  A `scaler` placeholder field is kept in checkpoints for
layout compatibility.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any = None  # momentum branch (pretraining) or model EMA
    tx: Any = flax.struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, params, tx, ema_params=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=ema_params,
            tx=tx,
        )

    def apply_gradients(self, grads, ema_params=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=ema_params if ema_params is not None else self.ema_params,
        )


def ema_update(ema_tree, param_tree, momentum):
    """param-wise EMA: m * ema + (1 - m) * param
    (reference: modeling_pretrain_moco_mim_ori.py:428-442)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * momentum + p.astype(e.dtype) * (1.0 - momentum),
        ema_tree,
        param_tree,
    )
