"""
Scaffold experiment directories.

Capability parity with reference src/01_create_experiment.py,
src/01_create_predictor_experiment.py, src/01_create_policy_experiment.py and
src/01_create_policy_oracle_experiment.py: the same nested experiment tree
  experiments/<EXP>/{experiment_params.json, models/, plots/, results/,
                     predictors/<PRED>/{...}, .../behaviors/<BEH>/{...},
                     oracle/<ORACLE>/{...}}
"""

import argparse
import os

from playslot_tpu.config import CONFIG, Config, get_available_configs
from playslot_tpu.utils.logger import Logger, print_

SUBDIRS = ("models", "plots", "results", "tboard_logs")


def _make_tree(path):
    os.makedirs(path, exist_ok=True)
    for d in SUBDIRS:
        os.makedirs(os.path.join(path, d), exist_ok=True)


def create_experiment(argv=None):
    p = argparse.ArgumentParser(description="Create a SAVi experiment")
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--name", required=True, help="name of the experiment dir")
    p.add_argument("--model_name", default="SAVi",
                   help=f"model config: {get_available_configs('models')}")
    p.add_argument("--dataset_name", required=True,
                   help=f"dataset config: {get_available_configs('datasets')}")
    args = p.parse_args(argv)

    exp_path = os.path.join(CONFIG["paths"]["experiments_path"],
                            args.exp_directory, args.name)
    _make_tree(exp_path)
    cfg = Config.new_experiment(exp_path, args.model_name, args.dataset_name)
    cfg.save()
    Logger(exp_path)
    print_(f"Created experiment at {exp_path}")
    return exp_path


def create_predictor_experiment(argv=None):
    p = argparse.ArgumentParser(description="Create a predictor experiment")
    p.add_argument("-d", "--exp_directory", required=True,
                   help="parent SAVi experiment directory")
    p.add_argument("--name", required=True, help="predictor experiment name")
    p.add_argument("--predictor_name", required=True,
                   help=f"predictor config: {get_available_configs('predictors')}")
    args = p.parse_args(argv)

    parent = args.exp_directory
    if not os.path.exists(os.path.join(parent, Config.FILENAME)):
        raise FileNotFoundError(f"no experiment at {parent}")
    pred_path = os.path.join(parent, "predictors", args.name)
    _make_tree(pred_path)
    cfg = Config.load(parent)
    cfg.add_predictor_parameters(args.predictor_name)
    cfg.save(pred_path)
    print_(f"Created predictor experiment at {pred_path}")
    return pred_path


def create_policy_experiment(argv=None):
    p = argparse.ArgumentParser(description="Create a behavior (policy) experiment")
    p.add_argument("-d", "--exp_directory", required=True,
                   help="predictor experiment directory")
    p.add_argument("--name", required=True)
    p.add_argument("--behavior_model", default="MarkovBehaviorCloner")
    p.add_argument("--action_decoder", default="MLPDecoder")
    args = p.parse_args(argv)

    parent = args.exp_directory
    beh_path = os.path.join(parent, "behaviors", args.name)
    _make_tree(beh_path)
    cfg = Config.load(parent)
    cfg.add_behavior_parameters(args.behavior_model, args.action_decoder)
    cfg.save(beh_path)
    print_(f"Created behavior experiment at {beh_path}")
    return beh_path


def create_oracle_experiment(argv=None):
    p = argparse.ArgumentParser(description="Create an oracle BC experiment")
    p.add_argument("-d", "--exp_directory", required=True,
                   help="parent SAVi experiment directory")
    p.add_argument("--name", required=True)
    p.add_argument("--behavior_model", default="MarkovBehaviorCloner")
    args = p.parse_args(argv)

    parent = args.exp_directory
    orc_path = os.path.join(parent, "oracle", args.name)
    _make_tree(orc_path)
    cfg = Config.load(parent)
    cfg.add_oracle_parameters(args.behavior_model)
    cfg.save(orc_path)
    print_(f"Created oracle experiment at {orc_path}")
    return orc_path
