"""Train state: params + BN stats + optimizer + loss-side memory banks.

Everything the reference keeps as module buffers / optimizer internals is
an explicit pytree here, so the whole training step is one pure jitted
function with donated state.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import MemTripletState, MemoryMoCoState, NCEAverageState
from ..models.moco import MoCoState


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # loss-side state (exactly one is non-None depending on LOSS.TYPE)
    moco: Optional[MoCoState] = None
    nce: Optional[NCEAverageState] = None
    mem_triplet: Optional[MemTripletState] = None
    # LOSS.TYPE='contrastive' with LOSS.MOCO: the MemoryMoCo queue
    # (reference loss/NCE_loss.py:188-241, intended moco=True dispatch)
    memory_moco: Optional[MemoryMoCoState] = None

    tx: optax.GradientTransformation = struct.field(pytree_node=False,
                                                    default=None)
    apply_fn: Callable = struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )


def make_optimizer(cfg, steps_per_epoch: Optional[int] = None
                   ) -> optax.GradientTransformation:
    """reference online_train.py:539-548: adam(lr, wd) or sgd(lr, momentum).

    ``OPTIM.SCHEDULE`` (epoch milestones, x0.1 LR drops) is honored when
    ``steps_per_epoch`` is known — the reference defines the key
    (config/default_params.py:150) but never consumes it; here the driver
    passes the loader length so the schedule actually drives the LR.
    """
    lr = cfg.OPTIM.LR
    milestones = list(cfg.OPTIM.SCHEDULE or [])
    if milestones and steps_per_epoch:
        lr = optax.piecewise_constant_schedule(
            cfg.OPTIM.LR, {m * steps_per_epoch: 0.1 for m in milestones})
    name = cfg.OPTIM.OPTIMIZER.lower()
    if name == "adam":
        return optax.chain(
            optax.add_decayed_weights(cfg.OPTIM.WD),
            optax.adam(lr),
        )
    assert name == "sgd", f"unknown optimizer {name!r}"
    # torch SGD momentum: buf = momentum*buf + grad; update = lr*buf
    return optax.sgd(lr, momentum=cfg.OPTIM.MOMENTUM, nesterov=False)


def create_train_state(rng, model, cfg, sample_input, tx=None,
                       train: bool = False) -> TrainState:
    variables = model.init(rng, sample_input, train=train)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = tx if tx is not None else make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
