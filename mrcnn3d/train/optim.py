"""Optimizer + LR schedule (optax).

Reference training recipe (configs/3d-multi-resolution-rcnn.py:233-244 +
mmdet/core/utils/dist_utils.py:134-182 DistOptimizerHook):
  SGD lr 1e-3, momentum 0.9, weight decay 1e-4, grad clip max_norm 35,
  step LR policy with linear warmup (10 iters, ratio 1/3).

Order of operations matches the reference: clip gradients first
(DistOptimizerHook clips after the all-reduce, before the step), then the
torch-SGD coupled weight decay (grad + wd * param), then momentum.
The cross-device gradient all-reduce is NOT represented here — it is
inserted by XLA from the jit sharding annotations (see train/step.py),
replacing the reference's explicit NCCL coalesced all_reduce.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def step_lr_schedule(
    base_lr: float,
    steps,
    iters_per_epoch: int,
    warmup_iters: int = 10,
    warmup_ratio: float = 1.0 / 3,
    gamma: float = 0.1,
):
    """mmcv 'step' policy: epoch-boundary decay + linear iter warmup.

    `steps` are epoch indices (reference lr_config step=[2500, 3000]).
    """
    boundaries = {int(e) * iters_per_epoch: gamma for e in steps}
    main = optax.piecewise_constant_schedule(base_lr, boundaries)

    def schedule(count):
        lr = main(count)
        # mmcv linear warmup: lr * (1 - (1 - ratio) * (1 - t/warmup))
        frac = jnp.minimum(count / max(warmup_iters, 1), 1.0)
        k = warmup_ratio + (1.0 - warmup_ratio) * frac
        return lr * k

    return schedule


def make_optimizer(optimizer_cfg, grad_clip_cfg, lr_schedule):
    """Build the optax chain from reference config dicts."""
    assert optimizer_cfg["type"] == "SGD"
    momentum = optimizer_cfg.get("momentum", 0.9)
    wd = optimizer_cfg.get("weight_decay", 0.0)
    parts = []
    if grad_clip_cfg:
        parts.append(
            optax.clip_by_global_norm(grad_clip_cfg.get("max_norm", 35.0))
        )
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*parts)
