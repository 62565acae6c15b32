"""
Global configuration and the experiment-parameter system.

Mirrors the layered config design of the reference (see reference
src/CONFIG.py:12-87 and src/lib/config.py:16-218): hardcoded DEFAULTS ->
JSON templates shipped with the package -> per-experiment
`experiment_params.json` materialized at experiment-creation time ->
CLI overrides. The on-disk schema is kept compatible with the reference so
experiment directories map 1:1.
"""

import json
import os
import copy

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))

CONFIG = {
    "random_seed": 13,
    "num_workers": 8,
    "paths": {
        "data_path": os.environ.get("PLAYSLOT_DATA_PATH", os.path.join(os.getcwd(), "datasets")),
        "experiments_path": os.environ.get(
            "PLAYSLOT_EXPERIMENTS_PATH", os.path.join(os.getcwd(), "experiments")
        ),
        "configs_path": os.path.join(_PKG_DIR, "configs"),
    },
    # compute dtype used on the TPU fast path ("bfloat16" or "float32");
    # params are always float32.
    "compute_dtype": os.environ.get("PLAYSLOT_COMPUTE_DTYPE", "float32"),
    # whether to use the fused Pallas kernels (TPU) or pure-XLA fallbacks
    "use_pallas": os.environ.get("PLAYSLOT_USE_PALLAS", "auto"),
}


DEFAULTS = {
    "dataset": {
        "dataset_name": "GridShapes",
        "shuffle_train": True,
        "shuffle_eval": False,
        "use_segmentation": True,
        "target": "rgb",
        "random_start": True,
    },
    "model": {
        "model_name": "",
        "model_params": {},
    },
    "loss": [
        {"type": "mse", "weight": 1},
    ],
    "predictor_loss": [
        {"type": "pred_img_mse", "weight": 1},
        {"type": "pred_slot_mse", "weight": 1},
        {"type": "VQLoss", "weight": 1, "beta": 0.25},
    ],
    "training": {
        "num_epochs": 1000,
        "save_frequency": 10,
        "log_frequency": 100,
        "image_log_frequency": 100,
        "batch_size": 64,
        "train_iters_per_epoch": 1000,
        "valid_iters_per_epoch": 100,
        "lr": 1e-4,
        "scheduler": "cosine_annealing",
        "scheduler_steps": 300000,
        "lr_warmup": True,
        "warmup_steps": 4000,
        "gradient_clipping": True,
        "clipping_max_value": 0.05,
    },
    "prediction_params": {
        "num_context": 6,
        "num_preds": 8,
        "teacher_force": False,
        "sample_length": 14,
        "input_buffer_size": 30,
    },
}


def get_available_configs(config_type):
    """List JSON config templates of a given kind shipped with the package."""
    cfg_dir = os.path.join(CONFIG["paths"]["configs_path"], config_type)
    if not os.path.isdir(cfg_dir):
        return []
    return sorted(f[:-5] for f in os.listdir(cfg_dir) if f.endswith(".json"))


def get_config(config_type, name):
    """Load a JSON config template (models/predictors/datasets/...)."""
    path = os.path.join(CONFIG["paths"]["configs_path"], config_type, f"{name}.json")
    if not os.path.exists(path):
        avail = get_available_configs(config_type)
        raise FileNotFoundError(f"Config '{name}' not found in {config_type}. Available: {avail}")
    with open(path, "r") as f:
        return json.load(f)


def get_model_config(name):
    return get_config("models", name)


def get_predictor_config(name):
    return get_config("predictors", name)


def get_dataset_config(name):
    return get_config("datasets", name)


class Config(dict):
    """
    Experiment-parameter dictionary persisted as `experiment_params.json`
    inside the experiment directory (same schema as the reference).
    """

    FILENAME = "experiment_params.json"

    def __init__(self, exp_path=None, **kwargs):
        super().__init__(**kwargs)
        self.exp_path = exp_path

    # ------------------------------------------------------------------ I/O
    @classmethod
    def load(cls, exp_path):
        path = os.path.join(exp_path, cls.FILENAME)
        with open(path, "r") as f:
            data = json.load(f)
        cfg = cls(exp_path=exp_path, **data)
        cfg._backfill_defaults()
        return cfg

    def save(self, exp_path=None):
        exp_path = exp_path or self.exp_path
        assert exp_path is not None, "No experiment path given"
        os.makedirs(exp_path, exist_ok=True)
        with open(os.path.join(exp_path, self.FILENAME), "w") as f:
            json.dump(dict(self), f, indent=4)
        self.exp_path = exp_path

    def _backfill_defaults(self):
        """Back-fill newly added default keys into an older config."""
        for key, val in DEFAULTS.items():
            if key not in self:
                self[key] = copy.deepcopy(val)
            elif isinstance(val, dict):
                for k2, v2 in val.items():
                    self[key].setdefault(k2, copy.deepcopy(v2))

    # ----------------------------------------------------------- factories
    @classmethod
    def new_experiment(cls, exp_path, model_name, dataset_name):
        """Create a fresh SAVi experiment config (reference 01_create_experiment)."""
        cfg = cls(exp_path=exp_path, **copy.deepcopy(DEFAULTS))
        cfg["model"] = {
            "model_name": "SAVi",
            "model_params": get_model_config(model_name),
        }
        cfg["dataset"].update(get_dataset_config(dataset_name))
        if str(cfg["dataset"].get("dataset_name", "")).startswith(
                "GridShapesOnDevice"):
            # stamp the generated-scene version at creation time so artifacts
            # trained on different scene generations stay identifiable (the
            # generator refuses configs from another version — see the scene
            # changelog in data/gridshapes_jax.py). Never backfilled: an old
            # config without the key predates version tagging by definition.
            from playslot_tpu.data.gridshapes_jax import SCENE_VERSION
            cfg["dataset"].setdefault("scene_version", SCENE_VERSION)
        return cfg

    def add_predictor_parameters(self, predictor_name):
        """Attach predictor params (reference lib/config.py:113-130)."""
        pred_cfg = get_predictor_config(predictor_name)
        self["predictor"] = pred_cfg
        self["predictor_loss"] = copy.deepcopy(DEFAULTS["predictor_loss"])
        if "prediction_params" not in self:
            self["prediction_params"] = copy.deepcopy(DEFAULTS["prediction_params"])
        return self

    def add_behavior_parameters(self, behavior_name, action_decoder_name):
        """Attach behavior-cloning params (reference lib/config.py:133-179)."""
        self["behavior_model"] = get_config("behavior_models", behavior_name)
        self["action_decoder"] = get_config("action_decoders", action_decoder_name)
        self["behavior_loss"] = [
            {"type": "latent_action_mse", "weight": 1.0},
            {"type": "action_mse", "weight": 0.01},
        ]
        return self

    def add_oracle_parameters(self, behavior_name):
        """Attach oracle behavior-cloning params (reference lib/config.py:182-215)."""
        self["behavior_model"] = get_config("behavior_models", behavior_name)
        self["behavior_loss"] = [{"type": "action_mse", "weight": 1.0}]
        return self
