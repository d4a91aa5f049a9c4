"""Flax model zoo (NHWC, bf16-ready) + torch weight conversion."""

from .resnet import ResNet, resnet50
from .tiny import TinyCNN
from .zoo import load_model, list_models, ModelBundle
