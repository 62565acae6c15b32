"""
Stage-2 trainer: PlaySlot predictor (cOCVP + InvDyn) on frozen SAVi slots.

Capability parity with reference src/base/basePredictorTrainer.py +
src/04_train_PlaySlot.py / 04_train_OCVP.py:
  * dataset num_frames forced to num_context + num_preds,
  * frozen SAVi extracts slots (stop-gradient),
  * loss covers context AND predicted frames (04_train_PlaySlot.py:102-108),
  * VQ-EMA codebook state threaded through the jitted step (mutable 'vq').
"""

import functools
import os

import jax
import jax.numpy as jnp
import optax

from playslot_tpu.models.factory import setup_model, setup_predictor
from playslot_tpu.train.losses import compute_losses
from playslot_tpu.train.schedulers import build_optimizer
from playslot_tpu.train.trainer import BaseTrainer, TrainState
from playslot_tpu.utils.checkpoint import load_checkpoint


class PredictorTrainer(BaseTrainer):
    def __init__(self, exp_path, savi_ckpt_path=None, name_predictor_experiment=None,
                 checkpoint=None, resume_training=False):
        pred_exp_path = os.path.join(exp_path, "predictors",
                                     name_predictor_experiment) \
            if name_predictor_experiment else exp_path
        super().__init__(pred_exp_path, checkpoint, resume_training)
        self.parent_exp_path = exp_path
        self.savi_ckpt_path = savi_ckpt_path
        # dataset must cover context + preds frames
        pp = self.exp_params["prediction_params"]
        self.num_context = pp["num_context"]
        self.num_preds = pp["num_preds"]
        self.exp_params["dataset"]["num_frames"] = self.num_context + self.num_preds

    # ------------------------------------------------------------- models
    def load_savi(self, savi_params=None):
        """Build the frozen SAVi and load its params (converted or orbax)."""
        self.savi = setup_model(self.exp_params["model"])
        if savi_params is not None:
            self.savi_params = savi_params
        elif self.savi_ckpt_path and self.savi_ckpt_path.endswith(".pth"):
            from playslot_tpu.utils.convert import convert_savi, load_torch_checkpoint
            ck = load_torch_checkpoint(self.savi_ckpt_path)
            sd = ck.get("model_state_dict", ck)
            self.savi_params = convert_savi(sd)
        elif self.savi_ckpt_path:
            ck = load_checkpoint(self.savi_ckpt_path)
            self.savi_params = ck["state"]["params"]
        else:
            raise ValueError("SAVi params or checkpoint path required")
        self.savi_params = jax.tree_util.tree_map(
            jax.lax.stop_gradient, self.savi_params)

    def setup_predictor(self):
        self.predictor = setup_predictor(
            self.exp_params["predictor"],
            savi_params=self.exp_params["model"]["model_params"],
            dtype=self._compute_dtype())
        self.tx, self.lr_schedule = build_optimizer(self.exp_params["training"])
        num_slots = self.exp_params["model"]["model_params"]["num_slots"]
        slot_dim = self.exp_params["model"]["model_params"]["slot_dim"]
        T = self.num_context + self.num_preds
        sample_slots = jnp.zeros((1, T, num_slots, slot_dim), jnp.float32)
        key = self._next_key()
        pred_name = self.exp_params["predictor"]["predictor_name"]
        self.is_action_cond = pred_name == "ActionCondOCVP"
        from playslot_tpu.models.ocvp import OCVP_MODELS
        self.is_ocvp = pred_name in OCVP_MODELS
        if self.is_ocvp:
            variables = jax.jit(lambda s: self.predictor.init(key, s))(
                sample_slots)
        elif self.is_action_cond:
            raw_dim = self.exp_params["predictor"]["predictor_params"]["raw_action_dim"]
            sample_actions = jnp.zeros((1, T, raw_dim), jnp.float32)
            variables = jax.jit(lambda s, a: self.predictor.init(
                {"params": key, "action": key}, s, a,
                num_seed=self.num_context, num_preds=self.num_preds))(
                    sample_slots, sample_actions)
        else:
            variables = jax.jit(lambda s: self.predictor.init(
                {"params": key, "action": key}, s,
                num_seed=self.num_context, num_preds=self.num_preds))(sample_slots)
        params = variables["params"]
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            vq=variables.get("vq", {}), opt_state=self.tx.init(params))
        self.log_architecture(self.predictor, params,
                              fname="architecture_predictor.txt")
        if self.checkpoint:
            self.restore(self.checkpoint)
        self.mesh = self._make_mesh()
        self._place_for_mesh()
        self._build_steps()

    # -------------------------------------------------------------- steps
    def _build_steps(self):
        savi, predictor, tx = self.savi, self.predictor, self.tx
        savi_params = self.savi_params
        loss_cfg = self.exp_params["predictor_loss"]
        nc, np_ = self.num_context, self.num_preds
        Tm1 = nc + np_ - 1
        is_action_cond = self.is_action_cond

        is_ocvp = self.is_ocvp
        teacher_force = self.exp_params["prediction_params"].get(
            "teacher_force", False)
        buffer_size = self.exp_params["prediction_params"].get(
            "input_buffer_size", 30)
        precision_ctx = self._precision_ctx

        # Memory levers for the frozen-SAVi render of predicted frames (the
        # step's dominant activation tensor) — same knobs and measured
        # rulings as the SAVi trainer (trainer.py / docs/PERFORMANCE.md):
        # training.decode_chunks chunks + rematerializes the render body;
        # training.remat="decode" checkpoints the whole render (measured
        # worse, kept for A/B).
        tcfg = self.exp_params.get("training", {})
        chunks = int(tcfg.get("decode_chunks", 1) or 1)

        def render_chunk(pred_slots):
            imgs, _, _ = savi.apply({"params": savi_params}, pred_slots,
                                    method=lambda m, s: m.decode_fast(s))
            return imgs

        render_remat = bool(tcfg.get("remat")) or chunks > 1

        def render_preds(pred_slots):
            from playslot_tpu.ops.chunked import chunked_apply
            return chunked_apply(render_chunk, pred_slots, chunks,
                                 remat=render_remat)

        def forward(params, vq, videos, actions, keys, train, noise=None):
            with precision_ctx():
                return forward_impl(params, vq, videos, actions, keys, train,
                                    noise)

        def forward_impl(params, vq, videos, actions, keys, train, noise=None):
            slots = savi.apply(
                {"params": savi_params}, videos, num_imgs=nc + np_, decode=False,
                rngs={"slots": keys[0]})["slot_history"]
            slots = jax.lax.stop_gradient(slots)
            if is_ocvp:
                # unconditional OCVP family: sliding-buffer AR rollout
                # (reference 04_train_OCVP.py + PredictorWrapper semantics:
                # teacher forcing only in train mode)
                from playslot_tpu.models.ocvp import predictor_wrapper_rollout
                # fresh dropout mask per AR step (reference draws fresh noise
                # on every PredictorWrapper forward)
                pred_slots = predictor_wrapper_rollout(
                    lambda x, t: predictor.apply(
                        {"params": params}, x, deterministic=not train,
                        rngs=({"dropout": jax.random.fold_in(keys[1], t)}
                              if train else None)),
                    slots, num_context=nc, num_preds=np_,
                    input_buffer_size=buffer_size,
                    teacher_force=teacher_force and train,
                    get_pred_only=False)
                out, new_vars = {}, {}
            else:
                pred_args = (slots, actions) if is_action_cond else (slots,)
                # `noise` overrides the reparameterization draw in the latent
                # predictors (invdyn.sample) — a determinism hook for the
                # torch-trajectory parity harness (tools/trajectory_parity.py)
                pred_kw = {} if (is_action_cond or noise is None) \
                    else {"noise": noise}
                (pred_slots, out), new_vars = predictor.apply(
                    {"params": params, "vq": vq}, *pred_args,
                    num_seed=nc, num_preds=np_, train=train, **pred_kw,
                    rngs={"action": keys[1]}, mutable=["vq"])
            pred_slots = pred_slots[:, :Tm1]
            # decode predicted slots with frozen SAVi (gradients DO flow
            # through the decode into pred_slots, as in the reference)
            pred_imgs = render_preds(pred_slots)
            tensors = dict(
                preds=pred_slots,
                targets=slots[:, 1:nc + np_],
                pred_imgs=pred_imgs,
                target_imgs=videos[:, 1:nc + np_],
            )
            if "action_dist" in out:
                tensors["action_directions_dist"] = out["action_dist"]
            if "vq_losses" in out:
                tensors.update(out["vq_losses"])
            total, ldict = compute_losses(loss_cfg, **tensors)
            return total, (ldict, new_vars.get("vq", vq))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, videos, actions, k0, k1, noise=None):
            grad_fn = jax.value_and_grad(
                lambda p: forward(p, state.vq, videos, actions, (k0, k1), True,
                                  noise),
                has_aux=True)
            (_, (ldict, new_vq)), grads = grad_fn(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params, vq=new_vq,
                                 opt_state=opt_state), ldict

        @jax.jit
        def valid_step(state, videos, actions, k0, k1):
            _, (ldict, _) = forward(state.params, state.vq, videos, actions,
                                    (k0, k1), False)
            return ldict

        self._train_step = train_step
        self._valid_step = valid_step

    def _unpack(self, batch):
        from playslot_tpu.data.loader import unwrap_batch_data
        videos, _, _, others = unwrap_batch_data(self.exp_params, batch)
        actions = others.get("actions")
        if actions is not None and actions.size:
            actions = self._shard_batch(jnp.asarray(actions, jnp.float32))
        else:
            actions = None
        return self._shard_batch(videos), actions

    def train_step(self, batch):
        videos, actions = self._unpack(batch)
        k0, k1 = self._next_key(2)
        self.state, ldict = self._train_step(self.state, videos, actions, k0, k1)
        return ldict

    def valid_step(self, batch):
        videos, actions = self._unpack(batch)
        k0, k1 = self._next_key(2)
        return self._valid_step(self.state, videos, actions, k0, k1)
