"""Framework-wide constants (reference src/constants.py, SURVEY.md C15)."""

MNIST = "mnist"
FASHION_MNIST = "fashion-mnist"
CLEVR = "clevr"
SYNTHETIC = "synthetic"

DATASETS = (SYNTHETIC, MNIST, FASHION_MNIST, CLEVR)

WANDB_PROJECT_NAME = "mmnc-tpu"
