"""Stage-1 eval CLI: SAVi reconstruction (mirror of src/03_evaluate_savi.py)."""

import argparse

from playslot_tpu.cli.common import resolve_savi_params
from playslot_tpu.train.evaluator import SAViEvaluator
from playslot_tpu.utils.logger import Logger, log_function, print_


@log_function
def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate SAVi reconstruction")
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir name or legacy .pth")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--results_name", default=None)
    p.add_argument("--max_batches", type=int, default=None)
    args = p.parse_args(argv)

    Logger(args.exp_directory)
    savi_params = resolve_savi_params(args.exp_directory, args.checkpoint)
    name = args.results_name or f"savi_eval_{args.checkpoint.replace('/', '_')}"
    evaluator = SAViEvaluator(args.exp_directory, savi_params,
                              batch_size=args.batch_size, results_name=name)
    results = evaluator.evaluate(max_batches=args.max_batches)
    print_(f"Done. Results: { {k: v['mean'] for k, v in results.items()} }")
    return results


if __name__ == "__main__":
    main()
