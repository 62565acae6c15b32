"""
Stage-1 trainer: SAVi video decomposition (MSE reconstruction).

Capability parity with reference src/base/baseTrainer.py + src/02_train_savi.py,
re-designed TPU-first: ONE jitted train step (forward + loss + grads + Adam +
clip + LR schedule), host loop only feeds batches and logs. Checkpoints via
orbax; losses.json + logs.txt mirror the reference experiment tree.
"""

import json
import functools
import os
import time

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from typing import Any

from playslot_tpu.config import Config
from playslot_tpu.data.loader import build_data_loader, load_data, unwrap_batch_data
from playslot_tpu.models.factory import setup_model
from playslot_tpu.train.losses import LossTracker, compute_losses
from playslot_tpu.train.schedulers import build_optimizer
from playslot_tpu.utils.checkpoint import checkpoint_name, load_checkpoint, save_checkpoint
from playslot_tpu.utils.logger import print_


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    vq: Any
    opt_state: Any


class BaseTrainer:
    """Shared scaffolding: config, data, checkpoint dirs, epoch loop."""

    def __init__(self, exp_path, checkpoint=None, resume_training=False):
        self.exp_path = exp_path
        self.exp_params = Config.load(exp_path)
        self.checkpoint = checkpoint
        self.resume_training = resume_training
        self.models_path = os.path.join(exp_path, "models")
        self.plots_path = os.path.join(exp_path, "plots")
        os.makedirs(self.models_path, exist_ok=True)
        os.makedirs(self.plots_path, exist_ok=True)
        self.training_losses = {}
        self.start_epoch = 0
        self.rng = jax.random.PRNGKey(
            int(self.exp_params.get("training", {}).get("seed", 13)))

    # ------------------------------------------------------------------ data
    def load_data(self):
        tcfg = self.exp_params["training"]
        self.train_set = load_data(self.exp_params, split="train")
        self.valid_set = load_data(self.exp_params, split="valid")
        self.train_loader = build_data_loader(
            self.train_set, batch_size=tcfg["batch_size"],
            shuffle=self.exp_params["dataset"].get("shuffle_train", True))
        self.valid_loader = build_data_loader(
            self.valid_set, batch_size=tcfg["batch_size"],
            shuffle=self.exp_params["dataset"].get("shuffle_eval", False))

    # ---------------------------------------------------------------- loop
    def training_loop(self):
        tcfg = self.exp_params["training"]
        num_epochs = tcfg["num_epochs"]
        save_freq = tcfg.get("save_frequency", 10)
        train_iters = tcfg.get("train_iters_per_epoch", 1000)
        valid_iters = tcfg.get("valid_iters_per_epoch", 100)

        from playslot_tpu.train.callbacks import Callbacks
        self.callbacks = Callbacks(self)

        try:
            for epoch in range(self.start_epoch, num_epochs):
                self.epoch = epoch
                self.callbacks.on_epoch_start(epoch)
                t0 = time.time()
                valid_losses = self.run_epoch(self.valid_loader, train=False,
                                              max_iters=valid_iters)
                train_losses = self.run_epoch(self.train_loader, train=True,
                                              max_iters=train_iters)
                dt = time.time() - t0
                print_(f"Epoch {epoch}: train={train_losses.get('_total', 0):.4f} "
                       f"valid={valid_losses.get('_total', 0):.4f} ({dt:.1f}s)")
                self.callbacks.on_epoch_end(epoch, train_losses, valid_losses)
                if (epoch + 1) % save_freq == 0 or epoch == num_epochs - 1:
                    self.save(checkpoint_name(epoch=epoch))
                self.save("checkpoint_last_saved")
            self.save(checkpoint_name(final=True))
        except (Exception, KeyboardInterrupt):
            # emergency checkpoint (reference setup_model.py:301-336)
            self.save(f"emergency_checkpoint_epoch_{getattr(self, 'epoch', 0)}")
            raise

    def run_epoch(self, loader, train, max_iters):
        tracker = LossTracker()
        cbs = getattr(self, "callbacks", None)
        for i, batch in enumerate(loader):
            if i >= max_iters:
                break
            if cbs:
                cbs.on_batch_start(getattr(self, "epoch", 0), i, train)
            losses = self.train_step(batch) if train else self.valid_step(batch)
            tracker.accumulate(losses)
            if cbs:
                cbs.on_batch_end(getattr(self, "epoch", 0), i, losses, train)
        return tracker.summary()

    def log_architecture(self, model, params, fname="architecture.txt"):
        """Model summary + parameter count (reference utils.py:192-233)."""
        import jax
        count = sum(int(np.prod(p.shape))
                    for p in jax.tree_util.tree_leaves(params))
        with open(os.path.join(self.exp_path, fname), "w") as f:
            f.write(f"{model}\n\nTotal parameters: {count}\n")
        print_(f"  --> {type(model).__name__}: {count} parameters")

    def _make_mesh(self):
        """
        Optional (data, model) mesh:
          * training.data_parallel_devices = D shards the batch over 'data'
            (XLA inserts the gradient all-reduce under jit),
          * training.model_parallel_devices = M tensor-shards the transformer
            MLP/attention kernels over 'model' (rules in parallel/mesh.py).
        Uses the first D*M local devices.
        """
        tcfg = self.exp_params.get("training", {})
        dp = int(tcfg.get("data_parallel_devices") or 1)
        tp = int(tcfg.get("model_parallel_devices") or 1)
        if dp * tp <= 1:
            return None
        from playslot_tpu.parallel.mesh import make_mesh
        return make_mesh(dp * tp, model_parallel=tp)

    def _place_for_mesh(self):
        """Place the train state onto the mesh: params (and the matching
        optimizer moments) follow the tensor-parallel sharding rules, the
        rest is replicated; later batches are sharded over 'data' and jit
        propagates shardings into the step."""
        if getattr(self, "mesh", None) is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P
        from playslot_tpu.parallel.mesh import param_shardings
        rep = NamedSharding(self.mesh, P())
        if self.mesh.shape.get("model", 1) > 1:
            # param_shardings keys on path suffixes, so it applies verbatim
            # to the optimizer state (adam mu/nu mirror the param tree;
            # scalars fall through to replicated)
            self.state = TrainState(
                step=jax.device_put(self.state.step, rep),
                params=jax.device_put(
                    self.state.params,
                    param_shardings(self.state.params, self.mesh)),
                vq=jax.device_put(self.state.vq, jax.tree_util.tree_map(
                    lambda _: rep, self.state.vq)),
                opt_state=jax.device_put(
                    self.state.opt_state,
                    param_shardings(self.state.opt_state, self.mesh)))
        else:
            self.state = jax.device_put(self.state, rep)

    def _shard_batch(self, videos):
        if getattr(self, "mesh", None) is None:
            return jnp.asarray(videos)
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(self.mesh, P("data"))
        if jax.process_count() > 1:
            # multi-process runtime: `videos` holds only this process's
            # process_shard rows (data/loader.py); assemble the global batch
            # from the per-host shards — no host ever materializes rows it
            # does not own
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(videos))
        return jax.device_put(jnp.asarray(videos), sharding)

    def _compute_dtype(self):
        """bf16 compute when training.compute_dtype == 'bfloat16' (f32 default)."""
        name = self.exp_params.get("training", {}).get("compute_dtype")
        return jnp.bfloat16 if name == "bfloat16" else None

    def _precision_ctx(self):
        """Context manager pinning jax matmul precision inside the jitted
        steps when training.matmul_precision is set ("highest" etc.).

        Why this exists: TPU f32 matmuls default to bf16-class passes. The
        InvDyn action latent is a DIFFERENCE of consecutive O(1) frame
        embeddings whose measured scale is 1e-2..1e-3 — bf16-class rounding
        noise on the embeddings (~0.4% of O(1)) rides through the subtraction
        and can exceed the entire signal (catastrophic cancellation). The
        closed-loop evaluator already pins "highest" for the same reason
        (sim_evaluator.py); this knob extends that to the stages where the
        channel is LEARNED (predictor) and DISTILLED (behavior cloning).
        Default unset == reference-equivalent behavior."""
        import contextlib
        name = self.exp_params.get("training", {}).get("matmul_precision")
        return jax.default_matmul_precision(name) if name \
            else contextlib.nullcontext()

    def _next_key(self, n=1):
        self.rng, *keys = jax.random.split(self.rng, n + 1)
        return keys[0] if n == 1 else keys

    # ---------------------------------------------------------- checkpoints
    def save(self, name):
        # Multi-process: EVERY process must call into orbax — its save
        # protocol runs cross-process barriers internally and writes each
        # (host-numpy, hence replicated) leaf from the primary host only.
        # Gating this call on process_index deadlocks: process 0 waits at
        # orbax's barrier while the others wait at the next training
        # collective (measured, tests/test_multiprocess_runtime.py).
        save_checkpoint(os.path.join(self.models_path, name), {
            "state": jax.device_get(flax.serialization.to_state_dict(self.state)),
            "epoch": np.asarray(getattr(self, "epoch", 0)),
        })

    def restore(self, name):
        """
        --checkpoint alone loads model weights only (fresh optimizer/epoch);
        --resume_training additionally restores optimizer state and resumes
        from the saved epoch (reference setup_model.py:246-297 semantics).
        """
        ck = load_checkpoint(os.path.join(self.models_path, name))
        if self.resume_training:
            self.state = flax.serialization.from_state_dict(self.state,
                                                            ck["state"])
            self.start_epoch = int(ck["epoch"]) + 1
        else:
            restored = flax.serialization.from_state_dict(self.state, ck["state"])
            self.state = self.state.replace(params=restored.params,
                                            vq=restored.vq)


class SAViTrainer(BaseTrainer):
    """Stage-1: train SAVi with MSE reconstruction (02_train_savi.py)."""

    def setup_model(self):
        self.model = setup_model(self.exp_params["model"],
                                 dtype=self._compute_dtype())
        self.tx, self.lr_schedule = build_optimizer(self.exp_params["training"])
        num_frames = self.exp_params["dataset"].get("num_frames", 8)
        sample = jnp.zeros(
            (1, num_frames, *self._frame_shape()), jnp.float32)
        key = self._next_key()
        # jitted init: eager init is pathologically slow on relayed TPUs
        variables = jax.jit(
            lambda x: self.model.init({"params": key, "slots": key}, x))(sample)
        params = variables["params"]
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            vq=variables.get("vq", {}), opt_state=self.tx.init(params))
        self.log_architecture(self.model, params)
        if self.checkpoint:
            self.restore(self.checkpoint)
        self.mesh = self._make_mesh()
        self._place_for_mesh()
        self._build_steps()

    def _frame_shape(self):
        img = self.exp_params["dataset"].get("img_size", [64, 64])
        if isinstance(img, int):
            img = [img, img]
        return (img[0], img[1], 3)

    def _build_steps(self):
        model, tx = self.model, self.tx
        loss_cfg = self.exp_params["loss"]
        precision_ctx = self._precision_ctx
        tcfg = self.exp_params.get("training", {})
        # the fused broadcast decode is the production path in training too
        # (differentiable; value+grad parity CI-tested). training.fast_decode
        # = false restores the naive per-map-broadcast decode for A/B.
        fast_decode = bool(tcfg.get("fast_decode", True))
        # Memory levers for the decode working set (the step's dominant
        # allocation, ~(B*T*S, H, W, C) per conv layer):
        #   * training.decode_chunks = N renders the decode in N sequential
        #     chunks (lax.map) with the chunk body REMATERIALIZED in the
        #     backward — peak decode memory becomes ~2 chunks' activations.
        #   * training.remat = "decode" checkpoints the whole decode —
        #     MEASURED WORSE (slower AND higher peak, docs/PERFORMANCE.md
        #     round-4 training section: decode activations already have
        #     minimal live range, being the last forward stage); kept as a
        #     documented knob for A/B only.
        remat = tcfg.get("remat")
        chunks = int(tcfg.get("decode_chunks", 1) or 1)

        def render_chunk(params, slot_history, train):
            method = (lambda m, s: m.decode_fast(s, train=train)) if fast_decode \
                else (lambda m, s: m.decode(s, train=train))
            combined, _, _ = model.apply({"params": params}, slot_history,
                                         method=method)
            return combined

        def make_render(train):
            from playslot_tpu.ops.chunked import chunked_apply
            chunk = functools.partial(render_chunk, train=train)

            def rendered(params, slot_history):
                return chunked_apply(
                    lambda s: chunk(params, s), slot_history, chunks,
                    remat=train and (bool(remat) or chunks > 1))
            return rendered

        render_train = make_render(True)
        render_eval = make_render(False)

        def loss_fn(params, videos, key):
            with precision_ctx():
                out = model.apply({"params": params}, videos, train=True,
                                  decode=False, rngs={"slots": key})
                recons = render_train(params, out["slot_history"])
                total, ldict = compute_losses(
                    loss_cfg, pred_imgs=recons, target_imgs=videos,
                    slot_history=out["slot_history"])
                return total, ldict

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, videos, key):
            (_, ldict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, videos, key)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 opt_state=opt_state), ldict

        @jax.jit
        def valid_step(state, videos, key):
            with precision_ctx():
                out = model.apply({"params": state.params}, videos,
                                  decode=False, rngs={"slots": key})
                recons = render_eval(state.params, out["slot_history"])
                _, ldict = compute_losses(
                    loss_cfg, pred_imgs=recons, target_imgs=videos,
                    slot_history=out["slot_history"])
                return ldict

        self._train_step = train_step
        self._valid_step = valid_step

    def make_visualizations(self):
        """GT row over reconstruction row for one validation sequence."""
        batch = next(iter(self.valid_loader))
        videos, _, _, _ = unwrap_batch_data(self.exp_params, batch)
        out = self.model.apply({"params": self.state.params},
                               jnp.asarray(videos[:1]),
                               rngs={"slots": self._next_key()})
        gt = np.clip(np.asarray(videos[0]), 0, 1)
        rec = np.clip(np.asarray(out["recons_imgs"][0]), 0, 1)
        T = min(gt.shape[0], 8)
        return np.concatenate([
            np.concatenate(list(gt[:T]), axis=1),
            np.concatenate(list(rec[:T]), axis=1)], axis=0)

    def train_step(self, batch):
        videos, _, _, _ = unwrap_batch_data(self.exp_params, batch)
        self.state, ldict = self._train_step(
            self.state, self._shard_batch(videos), self._next_key())
        return ldict

    def valid_step(self, batch):
        videos, _, _, _ = unwrap_batch_data(self.exp_params, batch)
        return self._valid_step(self.state, self._shard_batch(videos),
                                self._next_key())
