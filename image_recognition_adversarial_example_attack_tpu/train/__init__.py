"""Adversarial training (PGD-AT, TRADES, MART), TPU-native."""

from .adversarial import (AdvTrainConfig, TrainState, make_eval_step,
                          make_mart_step, make_train_step, make_trades_step,
                          train_state_from_bundle)
