"""
Stage-3 CLIs: behavior learning from demos, oracle training, and closed-loop
simulation evaluation (mirrors of reference src/10_learn_behavior_from_demos.py,
src/10_train_oracle.py, src/11_evaluate_behavior_on_simulation.py,
src/11_evaluate_oracle_simulation.py).
"""

import argparse
import os

from playslot_tpu.cli.common import resolve_predictor_variables, resolve_savi_params
from playslot_tpu.config import Config
from playslot_tpu.utils.checkpoint import load_checkpoint
from playslot_tpu.utils.logger import Logger, log_function, print_


@log_function
def learn_behavior(argv=None):
    p = argparse.ArgumentParser(description="Learn behavior from expert demos")
    p.add_argument("-d", "--exp_directory", required=True,
                   help="parent SAVi experiment directory")
    p.add_argument("--name_pred_exp", required=True)
    p.add_argument("--name_beh_exp", required=True)
    p.add_argument("--savi_ckpt", required=True)
    p.add_argument("--pred_ckpt", required=True)
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args(argv)

    from playslot_tpu.train.behavior_trainer import BehaviorTrainer
    pred_path = os.path.join(args.exp_directory, "predictors", args.name_pred_exp)
    beh_path = os.path.join(pred_path, "behaviors", args.name_beh_exp)
    Logger(beh_path)

    savi_vars = resolve_savi_params(args.exp_directory, args.savi_ckpt)
    pred_cfg = Config.load(beh_path)
    pred_vars = resolve_predictor_variables(
        pred_path, args.pred_ckpt,
        predictor_name=pred_cfg["predictor"]["predictor_name"])

    trainer = BehaviorTrainer(beh_path, checkpoint=args.checkpoint)
    # expert-demo dataset swap (reference load_data.py:110-161)
    name = trainer.exp_params["dataset"]["dataset_name"]
    if not name.endswith("_ExpertDemos") and name != "GridShapes":
        trainer.exp_params["dataset"]["dataset_name"] = name + "_ExpertDemos"
    trainer.load_data()
    trainer.load_models(savi_params=savi_vars["params"],
                        predictor_variables=pred_vars)
    trainer.setup_behavior_models()
    print_("Starting behavior training...")
    trainer.training_loop()


@log_function
def train_oracle(argv=None):
    p = argparse.ArgumentParser(description="Train oracle BC baseline")
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--name_oracle_exp", required=True)
    p.add_argument("--savi_ckpt", required=True)
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args(argv)

    from playslot_tpu.train.behavior_trainer import OracleTrainer
    orc_path = os.path.join(args.exp_directory, "oracle", args.name_oracle_exp)
    Logger(orc_path)
    savi_vars = resolve_savi_params(args.exp_directory, args.savi_ckpt)
    trainer = OracleTrainer(orc_path, checkpoint=args.checkpoint)
    name = trainer.exp_params["dataset"]["dataset_name"]
    if not name.endswith("_ExpertDemos") and name != "GridShapes":
        trainer.exp_params["dataset"]["dataset_name"] = name + "_ExpertDemos"
    trainer.load_data()
    trainer.load_models(savi_params=savi_vars["params"])
    trainer.setup_behavior_models()
    print_("Starting oracle training...")
    trainer.training_loop()


def _load_behavior_ckpt(beh_path, ckpt_name):
    ck = load_checkpoint(os.path.join(beh_path, "models", ckpt_name))
    params = ck["state"]["params"]
    return params["policy"], params.get("decoder")


@log_function
def evaluate_behavior(argv=None):
    p = argparse.ArgumentParser(description="Closed-loop behavior evaluation")
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--name_pred_exp", required=True)
    p.add_argument("--name_beh_exp", required=True)
    p.add_argument("--savi_ckpt", required=True)
    p.add_argument("--pred_ckpt", required=True)
    p.add_argument("--behavior_ckpt", required=True)
    p.add_argument("--num_sims", type=int, default=10)
    p.add_argument("--max_num_steps", type=int, default=20)
    p.add_argument("--sim_name", default=None)
    p.add_argument("--seed", type=int, default=1000)
    args = p.parse_args(argv)

    from playslot_tpu.train.sim_evaluator import SimulationEvaluator
    pred_path = os.path.join(args.exp_directory, "predictors", args.name_pred_exp)
    beh_path = os.path.join(pred_path, "behaviors", args.name_beh_exp)
    Logger(beh_path)

    savi_vars = resolve_savi_params(args.exp_directory, args.savi_ckpt)
    beh_cfg = Config.load(beh_path)
    pred_vars = resolve_predictor_variables(
        pred_path, args.pred_ckpt,
        predictor_name=beh_cfg["predictor"]["predictor_name"])
    policy_params, decoder_params = _load_behavior_ckpt(beh_path,
                                                        args.behavior_ckpt)
    ev = SimulationEvaluator(
        beh_path, savi_vars, pred_vars, policy_params, decoder_params,
        num_sims=args.num_sims, max_num_steps=args.max_num_steps,
        seed=args.seed, sim_name=args.sim_name)
    return ev.evaluate()


@log_function
def evaluate_oracle(argv=None):
    p = argparse.ArgumentParser(description="Closed-loop oracle evaluation")
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--name_oracle_exp", required=True)
    p.add_argument("--savi_ckpt", required=True)
    p.add_argument("--behavior_ckpt", required=True)
    p.add_argument("--num_sims", type=int, default=10)
    p.add_argument("--max_num_steps", type=int, default=20)
    p.add_argument("--sim_name", default=None)
    p.add_argument("--seed", type=int, default=1000)
    args = p.parse_args(argv)

    from playslot_tpu.train.sim_evaluator import SimulationEvaluator
    orc_path = os.path.join(args.exp_directory, "oracle", args.name_oracle_exp)
    Logger(orc_path)
    savi_vars = resolve_savi_params(args.exp_directory, args.savi_ckpt)
    policy_params, _ = _load_behavior_ckpt(orc_path, args.behavior_ckpt)
    ev = SimulationEvaluator(
        orc_path, savi_vars, None, policy_params, None,
        num_sims=args.num_sims, max_num_steps=args.max_num_steps,
        seed=args.seed, sim_name=args.sim_name, oracle=True)
    return ev.evaluate()
