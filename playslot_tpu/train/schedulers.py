"""
Optimizer + LR schedule construction.

Capability parity with reference src/lib/schedulers.py + setup_optimizer
(src/lib/setup_model.py:347-391): Adam, linear LR warmup over `warmup_steps`
iterations, then cosine annealing over `scheduler_steps` iterations, global
grad-norm clipping at `clipping_max_value`. Expressed as a single optax
chain evaluated inside the jitted train step.
"""

import optax


def build_lr_schedule(training_cfg):
    lr = training_cfg.get("lr", 1e-4)
    scheduler = training_cfg.get("scheduler", "")
    warmup = training_cfg.get("warmup_steps", 0) if training_cfg.get("lr_warmup") else 0
    steps = int(training_cfg.get("scheduler_steps", 1_000_000))
    if scheduler == "cosine_annealing":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=max(warmup, 1),
            decay_steps=max(warmup, 1) + steps, end_value=0.0)
    if scheduler in ("step", "multi_step"):
        # per-`scheduler_steps` decay by gamma (reference lr_scheduler.StepLR)
        gamma = training_cfg.get("scheduler_gamma", 0.1)
        decay = optax.exponential_decay(lr, transition_steps=steps,
                                        decay_rate=gamma, staircase=True)
        if warmup:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup), decay], [warmup])
        return decay
    if scheduler == "exponential":
        gamma = training_cfg.get("scheduler_gamma", 0.999)
        return optax.exponential_decay(lr, transition_steps=1, decay_rate=gamma)
    if warmup:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup),
             optax.constant_schedule(lr)], [warmup])
    return lr


def build_optimizer(training_cfg):
    """Adam + optional global-norm clipping, LR given by the schedule."""
    schedule = build_lr_schedule(training_cfg)
    tx = [optax.clip_by_global_norm(training_cfg["clipping_max_value"])] \
        if training_cfg.get("gradient_clipping") else []
    tx.append(optax.adam(schedule))
    return optax.chain(*tx), schedule
