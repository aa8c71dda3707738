"""Optimizer + LR schedules (reference parity).

Default trainer: Adam(lr=1e-4, betas=(0.9, 0.999), eps=0.01, weight_decay=1e-6,
amsgrad=True) — scripts_cvppp/main.py:492-493. torch's Adam weight_decay adds
wd * param to the gradient before the moment updates, reproduced with
optax.add_decayed_weights in front of the amsgrad transform.

Schedules mirror main.py:159-211: 'fixed', polynomial warmup/decay
(calculate_lr), steplr, multi_steplr, explr, lambdalr.
"""

from __future__ import annotations

import optax


def make_optimizer(base_lr: float = 1e-4, eps: float = 0.01,
                   weight_decay: float = 1e-6, amsgrad: bool = True,
                   opt_type: str = "adam", schedule=None):
    lr = schedule if schedule is not None else base_lr
    if opt_type == "sgd":
        return optax.chain(
            optax.add_decayed_weights(1e-4),
            optax.sgd(lr, momentum=0.9),
        )
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if amsgrad:
        parts.append(optax.scale_by_amsgrad(b1=0.9, b2=0.999, eps=eps))
    else:
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=eps))
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


def make_schedule(lr_mode: str, base_lr: float, end_lr: float,
                  total_iters: int, warmup_iters: int = 0,
                  decay_iters: int = 100000, power: float = 1.5,
                  step_size: int = 50000, gamma: float = 0.5):
    """Returns an optax schedule fn(step) -> lr."""
    import jax.numpy as jnp

    if lr_mode == "fixed":
        return lambda step: base_lr
    if lr_mode == "poly":  # reference calculate_lr (main.py:159-167)
        def sched(step):
            step = jnp.asarray(step, jnp.float32)
            warm = (base_lr - end_lr) * (step / max(warmup_iters, 1)) ** power + end_lr
            dec = (base_lr - end_lr) * (
                1 - (step - warmup_iters) / decay_iters) ** power + end_lr
            out = jnp.where(step < warmup_iters, warm,
                            jnp.where(step < decay_iters, dec, end_lr))
            return out
        return sched
    if lr_mode == "steplr":
        return optax.exponential_decay(base_lr, step_size, gamma,
                                       staircase=True)
    if lr_mode == "multi_steplr":
        return optax.piecewise_constant_schedule(
            base_lr, {100000: gamma, 150000: gamma})
    if lr_mode == "explr":
        return optax.exponential_decay(base_lr, 1, 0.999)
    if lr_mode == "lambdalr":
        return lambda step: base_lr * (1.0 - step / total_iters) ** 0.9
    raise ValueError(f"unknown lr_mode {lr_mode}")
