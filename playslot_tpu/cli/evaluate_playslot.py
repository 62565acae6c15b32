"""
Stage-2 eval CLI: stochastic PlaySlot video prediction
(mirror of reference src/05_evaluate_PlaySlot.py; canonical BASELINE config
is `--post_only --num_seed 6 --num_preds 15 --set_expert_policy`).
"""

import argparse
import os

from playslot_tpu.cli.common import resolve_predictor_variables, resolve_savi_params
from playslot_tpu.train.evaluator import PlaySlotEvaluator
from playslot_tpu.utils.logger import Logger, log_function, print_


@log_function
def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate PlaySlot video prediction")
    p.add_argument("-d", "--exp_directory", required=True,
                   help="parent SAVi experiment directory")
    p.add_argument("--name_pred_exp", required=True)
    p.add_argument("--savi_ckpt", required=True)
    p.add_argument("--checkpoint", required=True, help="predictor checkpoint")
    p.add_argument("--num_seed", type=int, default=6)
    p.add_argument("--num_preds", type=int, default=15)
    p.add_argument("--num_samples", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--post_only", action="store_true")
    p.add_argument("--set_expert_policy", action="store_true")
    p.add_argument("--results_name", default=None)
    p.add_argument("--max_batches", type=int, default=None)
    args = p.parse_args(argv)

    pred_path = os.path.join(args.exp_directory, "predictors", args.name_pred_exp)
    Logger(pred_path)
    savi_vars = resolve_savi_params(args.exp_directory, args.savi_ckpt)
    from playslot_tpu.config import Config
    pred_cfg = Config.load(pred_path)
    pred_vars = resolve_predictor_variables(
        pred_path, args.checkpoint,
        predictor_name=pred_cfg["predictor"]["predictor_name"])

    name = args.results_name or (
        f"eval_seed{args.num_seed}_preds{args.num_preds}"
        + ("_expert" if args.set_expert_policy else ""))
    evaluator = PlaySlotEvaluator(
        pred_path, savi_vars, pred_vars, num_seed=args.num_seed,
        num_preds=args.num_preds, num_samples=args.num_samples,
        post_only=args.post_only, batch_size=args.batch_size, results_name=name)
    results = evaluator.evaluate(max_batches=args.max_batches,
                                 expert_policy=args.set_expert_policy)
    print_("Done.")
    return results


if __name__ == "__main__":
    main()
