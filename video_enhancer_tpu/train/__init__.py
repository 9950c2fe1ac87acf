"""Training: losses, optimizer state, sharded train step.

The reference ships no training at all (inference-only, SURVEY.md §5
"Checkpoint/resume"); this subsystem is new surface so VSR models can be
fine-tuned on TPU pods.
"""

from .losses import charbonnier_loss, vsr_loss  # noqa: F401
from .step import TrainState, make_train_step  # noqa: F401
