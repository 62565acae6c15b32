"""
Production autoregressive rollout drivers for SlotGPT dynamics.

The in-module `forward_autoregressive` replicates the reference semantics by
statically unrolling every step (each with its own window shape) — correct,
but the compiled program grows linearly with num_preds and compile time
dominates on short jobs. These drivers compute the SAME windowed-recompute
math with:
  * an unrolled *growing* phase only until the context window fills
    (at most context_length - num_seed steps), then
  * a `lax.scan` *sliding* phase whose body is compiled ONCE: the window
    buffer is a fixed-shape carry, the action window is a dynamic slice of
    the precomputed action sequence.

Bitwise-equivalent (modulo float reassociation) to
SlotGPTDynamicsModel.forward_autoregressive(get_pred_only=True); tested in
tests/test_engine_rollout.py.
"""

import jax
import jax.numpy as jnp


def _fwd_single(predictor, variables, w_slots, w_act, w_var):
    """Parallel forward over one window via the bound dynamics model."""
    return predictor.apply(
        variables, w_slots, w_act, w_var,
        method=lambda m, s, a, v: m.dynamics_model.forward_single(
            s, a, action_vars=v))


def scan_rollout(predictor, variables, seed_slots, action_protos, action_vars,
                 num_preds):
    """
    Windowed AR rollout with precomputed per-step action conditioning.

    Args:
        seed_slots: (B, num_seed, S, D).
        action_protos: (B, >= num_seed + num_preds - 1, S, A).
        action_vars: same shape or None.
        num_preds: steps to predict.

    Returns (B, num_preds, S, D).
    """
    # Markov dynamics has no context_length field; any window works (it only
    # reads the last frame) — keep the historical 8-frame window for it
    L = getattr(_dynamics_fields(predictor), "context_length", 8)
    B, num_seed, S, D = seed_slots.shape
    use_var = action_vars is not None

    preds = []
    window = seed_slots

    # -------- growing phase (unrolled; at most L - num_seed steps)
    grow_steps = min(max(L - num_seed, 0), num_preds)
    for i in range(grow_steps):
        idx = num_seed + i
        w_act = action_protos[:, :idx]
        w_var = action_vars[:, :idx] if use_var else None
        cur = _fwd_single(predictor, variables, window, w_act, w_var)[:, -1:]
        preds.append(cur[:, 0])
        window = jnp.concatenate([window, cur], axis=1)

    remaining = num_preds - grow_steps
    if remaining > 0:
        if window.shape[1] > L:  # num_seed > L case: crop once
            window = window[:, -L:]
        # -------- sliding phase (lax.scan, body compiled once)
        # at scan step j (0-based), global idx = num_seed + grow_steps + j,
        # action window = protos[:, idx - L : idx]
        start0 = num_seed + grow_steps - L

        def body(carry, j):
            win = carry
            w_act = jax.lax.dynamic_slice_in_dim(action_protos, start0 + j, L,
                                                 axis=1)
            w_var = jax.lax.dynamic_slice_in_dim(action_vars, start0 + j, L,
                                                 axis=1) if use_var else None
            cur = _fwd_single(predictor, variables, win, w_act, w_var)[:, -1]
            win = jnp.concatenate([win[:, 1:], cur[:, None]], axis=1)
            return win, cur

        _, scan_preds = jax.lax.scan(body, window, jnp.arange(remaining))
        preds_arr = jnp.moveaxis(scan_preds, 0, 1)  # (B, remaining, S, D)
        if preds:
            return jnp.concatenate([jnp.stack(preds, axis=1), preds_arr], axis=1)
        return preds_arr
    return jnp.stack(preds, axis=1)


def _dynamics_fields(predictor):
    """Resolve the dynamics-model hyperparameters through the SAME factory
    the predictor's setup() uses (models/dynamics.py:get_dynamics_model), so
    cache shapes can never drift from the instantiated module's fields."""
    from playslot_tpu.models.dynamics import get_dynamics_model
    dm = get_dynamics_model(
        predictor.DynamicsModel, slot_dim=predictor.slot_dim,
        num_actions=predictor.num_actions, action_dim=predictor.action_dim,
        condition_mode=predictor.condition_mode,
        use_variability=predictor.use_variability, dtype=predictor.dtype,
        name=None)
    return dm


def init_kv_caches(predictor, batch, num_slots, dtype=None):
    """Per-layer KV buffers for kv_cached_rollout, sized to the full context
    window (context_length * num_slots tokens). Cache dtype defaults to the
    model's compute dtype (the k/v the blocks will write), so bf16 configs
    get bf16 caches instead of silently upcasting."""
    dm = _dynamics_fields(predictor)
    if dtype is None:
        dtype = predictor.dtype or jnp.float32
    Tmax = dm.context_length * num_slots
    return [
        {"k": jnp.zeros((batch, Tmax, dm.num_heads, dm.head_dim), dtype),
         "v": jnp.zeros((batch, Tmax, dm.num_heads, dm.head_dim), dtype),
         "len": jnp.zeros((), jnp.int32)}
        for _ in range(dm.num_layers)
    ]


def kv_cached_rollout(predictor, variables, seed_slots, action_protos,
                      action_vars, num_preds, dtype=None):
    """
    KV-cached AR rollout — incremental decode instead of windowed recompute.

    Exact (modulo float reassociation) vs scan_rollout while the window is
    GROWING, i.e. num_seed + num_preds <= context_length: token positions
    never shift, so cached K/V equal a full recompute's. Once the window
    slides the reference semantics re-base positions every step and a cache
    is no longer equivalent — this driver refuses that regime.

    Built for the round-1 VERDICT "KV-cache experiment at long context":
    at the production shapes (64-token windows) windowed recompute measured
    faster on the MXU (docs/PERFORMANCE.md lesson 3); this path exists to
    measure the crossover at context_length 16/32 (128-256 tokens).
    """
    L = _dynamics_fields(predictor).context_length
    B, num_seed, S, D = seed_slots.shape
    if num_seed + num_preds > L:
        raise ValueError(
            f"kv_cached_rollout requires num_seed+num_preds <= context_length "
            f"({num_seed}+{num_preds} > {L}): beyond that the reference's "
            f"sliding window re-bases positions and a KV cache is not "
            f"equivalent — use scan_rollout")
    use_var = action_vars is not None
    caches = init_kv_caches(predictor, B, S, dtype=dtype)

    def prime(m, s, a, v, c):
        return m.dynamics_model.forward_cached(s, a, v, caches=c, offset=0)

    pred, caches = predictor.apply(
        variables, seed_slots, action_protos[:, :num_seed],
        action_vars[:, :num_seed] if use_var else None, caches, method=prime)
    cur = pred[:, -1:]  # (B, 1, S, D)

    if num_preds == 1:
        return cur

    def step(m, s, a, v, c, off):
        return m.dynamics_model.forward_cached(s, a, v, caches=c, offset=off)

    def body(carry, i):
        caches, cur = carry
        idx = num_seed + i
        a = jax.lax.dynamic_slice_in_dim(action_protos, idx, 1, axis=1)
        v = jax.lax.dynamic_slice_in_dim(action_vars, idx, 1, axis=1) \
            if use_var else None
        pred, caches = predictor.apply(variables, cur, a, v, caches, idx,
                                       method=step)
        nxt = pred[:, -1:]
        return (caches, nxt), nxt[:, 0]

    (_, _), scan_preds = jax.lax.scan(body, (caches, cur),
                                      jnp.arange(num_preds - 1))
    rest = jnp.moveaxis(scan_preds, 0, 1)  # (B, num_preds-1, S, D)
    return jnp.concatenate([cur, rest], axis=1)


def posterior_rollout(predictor, variables, slot_history, num_seed, num_preds,
                      rng, noise=None):
    """
    Posterior eval path: InvDyn actions from the full slot history, then
    scan_rollout. Equivalent to
    forward_multiple_samples(num_samples=1, use_posterior=True).
    """
    num_slots = slot_history.shape[2]
    la_out = predictor.apply(
        variables, slot_history, noise,
        method=lambda m, s, nz: m.latent_action(s, noise=nz, train=False),
        rngs={"action": rng})
    protos = la_out["action_proto"]
    avars = la_out["action_variability"] if predictor.use_variability else None
    if protos.ndim == 3:  # single-action model: repeat per slot
        protos = jnp.tile(protos[:, :, None, :], (1, 1, num_slots, 1))
        if avars is not None:
            avars = jnp.tile(avars[:, :, None, :], (1, 1, num_slots, 1))
    return scan_rollout(predictor, variables, slot_history[:, :num_seed],
                        protos, avars, num_preds)


def batched_prior_rollout(predictor, variables, seed_slots, num_samples,
                          num_preds, rng):
    """
    All prior samples of the stochastic eval in ONE rollout: the sample axis
    is folded into the batch (the reference loops samples in Python,
    LatentActionPredictors.py:148-157 — identical in distribution, N x fewer
    program launches).

    Returns (B, num_samples, num_preds, S, D).
    """
    B, ns, S, D = seed_slots.shape
    tiled = jnp.repeat(seed_slots, num_samples, axis=0)  # (B*N, ns, S, D)

    def sample_priors(m, slots, n_preds):
        protos, idx = m.get_random_actions(slots, n_preds)
        avars = m.get_random_latents(slots, n_preds, src_action_idx=idx) \
            if m.use_variability else None
        return protos, avars

    protos, avars = predictor.apply(
        variables, tiled, num_preds, rngs={"action": rng},
        method=lambda m, s, n: sample_priors(m, s, n))
    preds = scan_rollout(predictor, variables, tiled, protos, avars, num_preds)
    return preds.reshape(B, num_samples, num_preds, S, D)
