"""Adversarial training (PGD-AT), TPU-native."""

from .adversarial import (AdvTrainConfig, TrainState, make_eval_step,
                          make_train_step, train_state_from_bundle)
