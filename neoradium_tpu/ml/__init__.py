"""ML-based receiver components (flax/optax, TPU-native).

Mirrors the reference's Playground/MLChEst pipeline (PyTorch there) as
first-class framework code: a residual CNN channel estimator plus training
and evaluation utilities.
"""
from .chestnet import (ChEstNet, MlChannelEstimator, ResBlock,
                       make_train_state, train_epoch, evaluate, predict,
                       complex_to_image, image_to_complex)
