"""
Stage-2 CLI: train the PlaySlot predictor (cOCVP + InvDyn) on a frozen SAVi
(mirror of reference src/04_train_PlaySlot.py / 04_train_OCVP.py — the same
trainer handles latent-action, action-conditional and unconditional
predictors through the factory).
"""

import argparse

from playslot_tpu.cli.common import resolve_savi_params
from playslot_tpu.train.predictor_trainer import PredictorTrainer
from playslot_tpu.utils.logger import Logger, log_function, print_


@log_function
def main(argv=None):
    p = argparse.ArgumentParser(description="Train a slot predictor on frozen SAVi")
    p.add_argument("-d", "--exp_directory", required=True,
                   help="parent SAVi experiment directory")
    p.add_argument("--name_pred_exp", required=True,
                   help="predictor experiment name under predictors/")
    p.add_argument("--savi_ckpt", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--resume_training", action="store_true")
    args = p.parse_args(argv)

    import os
    pred_path = os.path.join(args.exp_directory, "predictors", args.name_pred_exp)
    Logger(pred_path)
    trainer = PredictorTrainer(
        args.exp_directory, name_predictor_experiment=args.name_pred_exp,
        savi_ckpt_path=os.path.join(args.exp_directory, "models", args.savi_ckpt)
        if not os.path.isabs(args.savi_ckpt) else args.savi_ckpt,
        checkpoint=args.checkpoint, resume_training=args.resume_training)
    print_("Loading data...")
    trainer.load_data()
    print_("Loading frozen SAVi...")
    savi_vars = resolve_savi_params(args.exp_directory, args.savi_ckpt)
    trainer.load_savi(savi_params=savi_vars["params"])
    print_("Setting up predictor...")
    trainer.setup_predictor()
    print_("Starting training loop...")
    trainer.training_loop()


if __name__ == "__main__":
    main()
