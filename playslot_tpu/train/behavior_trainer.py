"""
Stage-3 trainer: behavior cloning from unlabeled expert demos.

Capability parity with reference src/10_learn_behavior_from_demos.py:
  * frozen SAVi encodes demo frames into slots,
  * frozen InvDyn infers target latent actions from consecutive slots,
  * MarkovBehaviorCloner predicts the latent action from slots[:, :-1],
  * MLPActionDecoder maps stop-gradient(policy latents) -> robot actions,
  * losses: latent_action_mse (w=1) + action_mse (w=0.01), one backward,
    both modules updated.

Optimizer semantics match the reference's stage-3 override exactly (found
by the round-4 trajectory-parity harness, tools/trajectory_parity.py):
the reference builds two Adams but wires the warmup/cosine callback to the
POLICY optimizer only (10_learn_behavior_from_demos.py:105-115) — the
action decoder trains at constant base lr — and its forward override never
clips gradients (205-217), unlike stages 1/2. Implemented via
build_behavior_optimizer (shared Adam moments + per-branch lr scale);
`behavior_fused_optimizer: true` restores the pre-round-4 behavior (one
clipped, fully-scheduled Adam) for A/B with the committed round-3 studies.

Also covers the oracle variant (src/10_train_oracle.py): slots -> GT actions
with action_mse only, predictions and targets clamped to [-1, 1] as the
reference does (10_train_oracle.py:128-131); the oracle DOES clip per
training.gradient_clipping (10_train_oracle.py:136-141).
"""

import functools
import os

import jax
import jax.numpy as jnp
import optax

from playslot_tpu.models.factory import (
    setup_action_decoder, setup_behavior_model, setup_model, setup_predictor,
)
from playslot_tpu.train.losses import compute_losses
from playslot_tpu.train.schedulers import (build_behavior_optimizer,
                                           build_optimizer)
from playslot_tpu.train.trainer import BaseTrainer, TrainState


class BehaviorTrainer(BaseTrainer):
    """Joint policy + action-decoder training (PlaySlot stage 3)."""

    ORACLE = False

    def __init__(self, exp_path, **kwargs):
        super().__init__(exp_path, **kwargs)
        # behavior stage uses {num_context: 1, num_preds: 16} semantics —
        # sequences come straight from the expert-demo dataset
        self.num_frames = self.exp_params["dataset"].get("num_frames", 16)

    def load_models(self, savi_params, predictor_variables=None):
        self.savi = setup_model(self.exp_params["model"])
        self.savi_params = savi_params
        if not self.ORACLE:
            assert predictor_variables is not None
            self.predictor = setup_predictor(
                self.exp_params["predictor"],
                savi_params=self.exp_params["model"]["model_params"])
            self.pred_variables = predictor_variables

    def setup_behavior_models(self):
        mp = self.exp_params["model"]["model_params"]
        slot_dim = mp["slot_dim"]
        if self.ORACLE:
            action_dim = self.exp_params.get("action_dim", 4)
        else:
            action_dim = self.exp_params["predictor"]["predictor_params"]["action_dim"]
        self.policy = setup_behavior_model(
            self.exp_params["behavior_model"], slot_dim=slot_dim,
            action_dim=action_dim)
        params = {"policy": None, "decoder": None}
        key = self._next_key()
        sample_slots = jnp.zeros((1, 2, mp["num_slots"], slot_dim), jnp.float32)
        params["policy"] = jax.jit(
            lambda s: self.policy.init(key, s))(sample_slots)["params"]
        if not self.ORACLE:
            self.action_decoder = setup_action_decoder(
                self.exp_params["action_decoder"])
            sample_lat = jnp.zeros((1, 2, action_dim), jnp.float32)
            params["decoder"] = jax.jit(
                lambda z: self.action_decoder.init(key, z))(sample_lat)["params"]
        else:
            params.pop("decoder")

        if self.ORACLE or self.exp_params.get("behavior_fused_optimizer"):
            # oracle: single model, standard clip+scheduled Adam
            # (10_train_oracle.py:136-141). behavior_fused_optimizer=true
            # restores the pre-round-4 deviation EXACTLY (one clipped Adam
            # over the combined tree, BOTH branches lr-scheduled) for A/B
            # against the committed round-3 study artifacts.
            self.tx, self.lr_schedule = build_optimizer(
                self.exp_params["training"])
        else:
            self.tx, self.lr_schedule = build_behavior_optimizer(
                self.exp_params["training"])
        self.state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                vq={}, opt_state=self.tx.init(params))
        if self.checkpoint:
            self.restore(self.checkpoint)
        self._build_steps()

    # -------------------------------------------------------------- steps
    def _build_steps(self):
        savi, policy, tx = self.savi, self.policy, self.tx
        savi_params = self.savi_params
        oracle = self.ORACLE
        loss_cfg = self.exp_params.get(
            "behavior_loss",
            [{"type": "action_mse", "weight": 1.0}] if oracle else
            [{"type": "latent_action_mse", "weight": 1.0},
             {"type": "action_mse", "weight": 0.01}])
        distill_target = self.exp_params.get("behavior_distill_target", "sample")
        predictor = None if oracle else self.predictor
        pred_vars = None if oracle else self.pred_variables
        action_decoder = None if oracle else self.action_decoder
        precision_ctx = self._precision_ctx

        def forward(params, videos, gt_actions, keys, train, noise=None):
            with precision_ctx():
                return forward_impl(params, videos, gt_actions, keys, train,
                                    noise)

        def forward_impl(params, videos, gt_actions, keys, train, noise):
            slots = savi.apply({"params": savi_params}, videos, decode=False,
                               rngs={"slots": keys[0]})["slot_history"]
            slots = jax.lax.stop_gradient(slots)
            tensors = {}
            if oracle:
                pred_actions = policy.apply({"params": params["policy"]}, slots,
                                            deterministic=not train)
                # reference 10_train_oracle.py:128-131 clamps BOTH sides of
                # the regression to [-1, 1] before the MSE
                tensors["pred_actions"] = jnp.clip(pred_actions, -1.0, 1.0)
                tensors["target_actions"] = jnp.clip(
                    gt_actions[:, :pred_actions.shape[1]], -1.0, 1.0)
            else:
                la_out = predictor.apply(
                    pred_vars, slots, rngs={"action": keys[1]},
                    method=lambda m, s, **kw: m.latent_action(s, **kw),
                    noise=noise)
                if distill_target == "mean":
                    # framework extension: distill the noise-free action-
                    # direction MEAN instead of the reparameterized sample
                    # (reference 10_learn_behavior:181 uses the sample; with
                    # an untamed variance head the sample can be noise-
                    # dominated and the mean is the informative signal)
                    target_latents = jax.lax.stop_gradient(
                        la_out["action_dist"][:, :, 0])
                else:
                    target_latents = jax.lax.stop_gradient(
                        la_out["sampled_latent_action"])
                pred_latents = policy.apply(
                    {"params": params["policy"]}, slots[:, :-1],
                    deterministic=not train)
                pred_actions = action_decoder.apply(
                    {"params": params["decoder"]},
                    jax.lax.stop_gradient(pred_latents))
                tensors["pred_action_embs"] = pred_latents
                tensors["target_action_embs"] = target_latents
                tensors["pred_actions"] = pred_actions
                T = pred_actions.shape[1]
                tensors["target_actions"] = gt_actions[:, :T]
            total, ldict = compute_losses(loss_cfg, **tensors)
            return total, ldict

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, videos, gt_actions, k0, k1, noise=None):
            (_, ldict), grads = jax.value_and_grad(
                lambda p: forward(p, videos, gt_actions, (k0, k1), True, noise),
                has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 opt_state=opt_state), ldict

        @jax.jit
        def valid_step(state, videos, gt_actions, k0, k1, noise=None):
            _, ldict = forward(state.params, videos, gt_actions, (k0, k1),
                               False, noise)
            return ldict

        self._train_step = train_step
        self._valid_step = valid_step

    def _unpack(self, batch):
        from playslot_tpu.data.loader import unwrap_batch_data
        videos, _, _, others = unwrap_batch_data(self.exp_params, batch)
        actions = others.get("actions")
        if actions is None or not actions.size:
            raise ValueError("behavior training requires GT actions in the dataset")
        return jnp.asarray(videos), jnp.asarray(actions, jnp.float32)

    def train_step(self, batch):
        videos, actions = self._unpack(batch)
        k0, k1 = self._next_key(2)
        self.state, ldict = self._train_step(self.state, videos, actions, k0, k1)
        return ldict

    def valid_step(self, batch):
        videos, actions = self._unpack(batch)
        k0, k1 = self._next_key(2)
        return self._valid_step(self.state, videos, actions, k0, k1)


class OracleTrainer(BehaviorTrainer):
    """Oracle BC baseline: slots -> GT robot actions (10_train_oracle.py)."""

    ORACLE = True
