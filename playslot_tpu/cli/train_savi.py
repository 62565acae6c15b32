"""Stage-1 CLI: train SAVi (mirror of reference src/02_train_savi.py)."""

import argparse

from playslot_tpu.train.trainer import SAViTrainer
from playslot_tpu.utils.logger import Logger, log_function, print_


@log_function
def main(argv=None):
    p = argparse.ArgumentParser(description="Train SAVi decomposition model")
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--resume_training", action="store_true")
    args = p.parse_args(argv)

    Logger(args.exp_directory)
    trainer = SAViTrainer(args.exp_directory, checkpoint=args.checkpoint,
                          resume_training=args.resume_training)
    print_("Loading data...")
    trainer.load_data()
    print_("Setting up model...")
    trainer.setup_model()
    print_("Starting training loop...")
    trainer.training_loop()


if __name__ == "__main__":
    main()
