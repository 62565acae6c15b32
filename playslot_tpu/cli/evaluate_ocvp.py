"""
Stage-2 eval CLI for the OCVP family / ActionCondOCVP (deterministic;
mirror of reference src/05_evaluate_OCVP.py).
"""

import argparse
import os

from playslot_tpu.cli.common import resolve_predictor_variables, resolve_savi_params
from playslot_tpu.config import Config
from playslot_tpu.train.evaluator import OCVPEvaluator
from playslot_tpu.utils.logger import Logger, log_function, print_


@log_function
def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate OCVP video prediction")
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--name_pred_exp", required=True)
    p.add_argument("--savi_ckpt", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num_seed", type=int, default=6)
    p.add_argument("--num_preds", type=int, default=15)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--set_expert_policy", action="store_true")
    p.add_argument("--post_only", action="store_true",
                   help="accepted for script parity; OCVP eval is deterministic")
    p.add_argument("--results_name", default=None)
    p.add_argument("--max_batches", type=int, default=None)
    args = p.parse_args(argv)

    pred_path = os.path.join(args.exp_directory, "predictors", args.name_pred_exp)
    Logger(pred_path)
    savi_vars = resolve_savi_params(args.exp_directory, args.savi_ckpt)
    cfg = Config.load(pred_path)
    pred_vars = resolve_predictor_variables(
        pred_path, args.checkpoint,
        predictor_name=cfg["predictor"]["predictor_name"])

    name = args.results_name or f"eval_ocvp_seed{args.num_seed}_preds{args.num_preds}"
    ev = OCVPEvaluator(pred_path, savi_vars, pred_vars, num_seed=args.num_seed,
                       num_preds=args.num_preds, batch_size=args.batch_size,
                       results_name=name)
    results = ev.evaluate(max_batches=args.max_batches,
                          expert_policy=args.set_expert_policy)
    print_("Done.")
    return results


if __name__ == "__main__":
    main()
