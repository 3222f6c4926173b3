"""Train state with the reference's two-optimizer partition.

The reference trains with two Adams (src/models/multi_task_compressor.py:
389-418): "main" over everything except the entropy-bottleneck `quantiles`
(plus the loss-balancer log_vars) with a cosine-annealed lr, and "aux" over
the quantiles only at a fixed lr. Here both live in ONE optax
`multi_transform`, applied from ONE backward pass:

* in training mode the main loss never touches `quantiles` (noise
  quantization uses no medians), and
* the aux loss stop-gradients every density parameter,

so grad(main_loss + aux_loss) is already block-diagonal over the partition —
the reference's backward(loss); step; backward(aux); step collapses into a
single fused jit step with no graph break (SURVEY.md §7 hard part (f)).
"""

from typing import Any

import optax
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict


class TrainState(struct.PyTreeNode):
    step: Any
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def param_partition(params):
    """Label each leaf 'aux' iff its path ends in 'quantiles', else 'main'
    (the reference's .quantiles split, multi_task_compressor.py:389-397)."""
    flat = flatten_dict(params)
    labels = {k: ("aux" if k[-1] == "quantiles" else "main") for k in flat}
    return unflatten_dict(labels)


def create_train_state(
    params,
    total_steps: int,
    learning_rate_main: float = 1e-4,
    learning_rate_aux: float = 1e-3,
    eta_min: float = 1e-8,
) -> TrainState:
    """Cosine-annealed main Adam + fixed-lr aux Adam, as one transformation.

    Matches torch.optim.lr_scheduler.CosineAnnealingLR(T_max=total_steps,
    eta_min=1e-8) over Adam(lr_main), and Adam(lr_aux) for quantiles
    (reference configure_optimizers, multi_task_compressor.py:399-418).
    """
    main_sched = optax.cosine_decay_schedule(
        init_value=learning_rate_main,
        decay_steps=max(total_steps, 1),
        alpha=eta_min / learning_rate_main,
    )
    tx = optax.multi_transform(
        {"main": optax.adam(main_sched), "aux": optax.adam(learning_rate_aux)},
        param_partition(params),
    )
    return TrainState(step=0, params=params, opt_state=tx.init(params), tx=tx)
