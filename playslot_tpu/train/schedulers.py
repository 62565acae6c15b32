"""
Optimizer + LR schedule construction.

Capability parity with reference src/lib/schedulers.py + setup_optimizer
(src/lib/setup_model.py:347-391): Adam, linear LR warmup over `warmup_steps`
iterations, then cosine annealing over `scheduler_steps` iterations, global
grad-norm clipping at `clipping_max_value`. Expressed as a single optax
chain evaluated inside the jitted train step.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def build_lr_schedule(training_cfg):
    lr = training_cfg.get("lr", 1e-4)
    scheduler = training_cfg.get("scheduler", "")
    warmup = training_cfg.get("warmup_steps", 0) if training_cfg.get("lr_warmup") else 0
    steps = int(training_cfg.get("scheduler_steps", 1_000_000))
    if scheduler == "cosine_annealing":
        # Exact replica of the reference's per-step lr sequence (measured by
        # tools/trajectory_parity.py compare_lr_sequences, 1e-7 max rel diff):
        # linear warmup lr*t/w for t<=w (LRWarmUp, schedulers.py:69-137), ONE
        # hold step at lr (the WarmupVSScehdule deactivation call at t=w+1
        # consumes an orchestrator tick without stepping the cosine,
        # schedulers.py:97-105), then cosine (1+cos(pi*(t-w-1)/steps))/2.
        # BEYOND t = w+1+steps torch CosineAnnealingLR oscillates back up
        # with period 2*steps. Default "clamp" holds 0 instead (a bouncing
        # lr is almost certainly unintended, and no shipped reference run
        # crosses scheduler_steps in its logged history) — a documented
        # deviation (docs/MIGRATION.md DEVIATIONS). Set
        # training.scheduler_post_tmax: "bounce" for the reference's exact
        # periodic behavior (torch closed form, _get_closed_form_lr:
        # eta_min + (base-eta_min)(1+cos(pi t/T))/2, unclamped);
        # parity-tested past T_max in tests/test_misc_components.py.
        if training_cfg.get("scheduler_post_tmax", "clamp") == "bounce":
            def cosine(count):
                return lr * 0.5 * (1.0 + jnp.cos(jnp.pi * count / steps))
        else:
            cosine = optax.cosine_decay_schedule(lr, steps)
        if warmup:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup), cosine],
                [warmup + 1])
        return cosine
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


class ScaleByBranchLRState(NamedTuple):
    count: jnp.ndarray


def scale_by_branch_lrs(schedules):
    """Final-scale stage applying a DIFFERENT lr schedule per top-level
    param-dict branch (updates must be a dict whose keys ⊆ schedules)."""
    def init(params):
        del params
        return ScaleByBranchLRState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        del params
        scaled = {
            k: jax.tree_util.tree_map(
                lambda u, _lr=schedules[k](state.count): -_lr * u, v)
            for k, v in updates.items()}
        return scaled, ScaleByBranchLRState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def build_behavior_optimizer(training_cfg):
    """
    Stage-3 (behavior-cloning) optimizer with the reference's EXACT update
    semantics (src/10_learn_behavior_from_demos.py:80-119,205-217): the
    reference builds TWO Adams — the trainer's warmup/scheduler callback is
    wired to the POLICY optimizer only, so the action decoder trains at the
    CONSTANT base lr for the whole run — and its stage-3 forward override
    calls loss.backward() + both .step() calls with NO gradient clipping
    (unlike stages 1/2/oracle, which clip per training.gradient_clipping).

    Implemented as one chain over the {"policy": ..., "decoder": ...} param
    dict: shared scale_by_adam (Adam moments are per-parameter, so one pass
    == two optimizers) followed by a per-branch lr scale. Verified step-
    local against the reference by tools/trajectory_parity.py (behavior
    stage). The pre-round-4 fused behavior (one clipped, fully-scheduled
    Adam) stays available via `behavior_fused_optimizer: true`.
    """
    schedule = build_lr_schedule(training_cfg)
    const = optax.constant_schedule(training_cfg.get("lr", 1e-4))
    tx = [optax.scale_by_adam(),
          scale_by_branch_lrs({"policy": schedule, "decoder": const})]
    return optax.chain(*tx), schedule
