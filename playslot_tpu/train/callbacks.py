"""
Callback engine for the trainers.

Capability parity with reference src/lib/callbacks.py + base_callbacks.py:
the same hook set (on_epoch_start/end, on_train_epoch_end, on_valid_epoch_end,
on_batch_start/end), auto-registration of default callbacks, and the
per-experiment `callbacks.py` plugin file dropped into the experiment dir.

Default callbacks:
  * LogToTensorboard — per-iteration scalars + per-epoch losses
    (tensorboard is available in this image).
  * LogLossesToJSON — losses.json + loss-curve PNGs.
  * ProfilerCallback — jax.profiler traces of N steps when
    PLAYSLOT_PROFILE_DIR is set (the reference has no profiler at all;
    SURVEY.md §5 makes this a first-class addition).
"""

import importlib.util
import json
import os

from playslot_tpu.utils.logger import print_


class Callback:
    """Base callback; subclasses override any subset of the hooks."""

    def __init__(self, trainer):
        self.trainer = trainer

    def on_epoch_start(self, epoch):
        pass

    def on_epoch_end(self, epoch, train_losses, valid_losses):
        pass

    def on_batch_start(self, epoch, it, train):
        pass

    def on_batch_end(self, epoch, it, losses, train):
        pass


class LogToTensorboard(Callback):
    def __init__(self, trainer):
        super().__init__(trainer)
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(
                log_dir=os.path.join(trainer.exp_path, "tboard_logs"))
        except Exception as e:  # tensorboard genuinely optional
            print_(f"Tensorboard unavailable: {e}")
        self.log_frequency = trainer.exp_params["training"].get("log_frequency", 100)
        self._step = 0

    def on_batch_end(self, epoch, it, losses, train):
        if not train or self.writer is None:
            return
        self._step += 1
        if self._step % self.log_frequency == 0:
            for k, v in losses.items():
                self.writer.add_scalar(f"train_iter/{k}", float(v), self._step)

    def on_epoch_end(self, epoch, train_losses, valid_losses):
        if self.writer is None:
            return
        for k, v in train_losses.items():
            self.writer.add_scalar(f"train/{k}", v, epoch)
        for k, v in valid_losses.items():
            self.writer.add_scalar(f"valid/{k}", v, epoch)
        # image logging (reference image_log_frequency behavior)
        img_freq = max(self.trainer.exp_params["training"].get(
            "image_log_frequency", 100) // max(
            self.trainer.exp_params["training"].get(
                "train_iters_per_epoch", 1000), 1), 1)
        make_vis = getattr(self.trainer, "make_visualizations", None)
        if make_vis is not None and epoch % img_freq == 0:
            try:
                import numpy as _np
                img = make_vis()  # (H, W, 3) float [0,1]
                if img is not None:
                    self.writer.add_image(
                        "visualizations/recons",
                        _np.transpose(_np.asarray(img), (2, 0, 1)), epoch)
            except Exception as e:
                from playslot_tpu.utils.logger import print_
                print_(f"image logging failed: {e}")
        self.writer.flush()


class LogLossesToJSON(Callback):
    def on_epoch_end(self, epoch, train_losses, valid_losses):
        tr = self.trainer
        path = os.path.join(tr.exp_path, "losses.json")
        tr.training_losses[str(epoch)] = {"train": train_losses,
                                          "valid": valid_losses}
        with open(path, "w") as f:
            json.dump(tr.training_losses, f, indent=2)
        try:
            from playslot_tpu.utils.visualizations import plot_loss_curves
            plot_loss_curves(tr.training_losses,
                             os.path.join(tr.plots_path, "loss_curves.png"))
        except Exception:
            pass


class ProfilerCallback(Callback):
    """Trace steps [2, 2+N) of epoch 0 into PLAYSLOT_PROFILE_DIR."""

    def __init__(self, trainer):
        super().__init__(trainer)
        self.dir = os.environ.get("PLAYSLOT_PROFILE_DIR")
        self.num_steps = int(os.environ.get("PLAYSLOT_PROFILE_STEPS", "3"))
        self.active = False

    def on_batch_start(self, epoch, it, train):
        if not self.dir or not train or epoch != 0:
            return
        if it == 2:
            import jax
            jax.profiler.start_trace(self.dir)
            self.active = True
            print_(f"profiler: tracing {self.num_steps} steps -> {self.dir}")

    def on_batch_end(self, epoch, it, losses, train):
        if self.active and it >= 2 + self.num_steps - 1:
            import jax
            jax.profiler.stop_trace()
            self.active = False


DEFAULT_CALLBACKS = [LogToTensorboard, LogLossesToJSON, ProfilerCallback]


class Callbacks:
    """Registry + dispatcher; loads per-experiment callbacks.py plugins."""

    def __init__(self, trainer):
        import jax
        if jax.process_count() > 1 and jax.process_index() != 0:
            # multi-process runtime: every default callback writes files
            # into the (shared) experiment dir — only process 0 logs
            self.callbacks = []
            return
        self.callbacks = [cls(trainer) for cls in DEFAULT_CALLBACKS]
        plugin = os.path.join(trainer.exp_path, "callbacks.py")
        if os.path.exists(plugin):
            spec = importlib.util.spec_from_file_location("exp_callbacks", plugin)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            for name in dir(mod):
                obj = getattr(mod, name)
                if isinstance(obj, type) and issubclass(obj, Callback) \
                        and obj is not Callback:
                    self.callbacks.append(obj(trainer))
                    print_(f"registered experiment callback {name}")

    def __getattr__(self, hook):
        def dispatch(*args, **kwargs):
            for cb in self.callbacks:
                getattr(cb, hook)(*args, **kwargs)
        return dispatch
