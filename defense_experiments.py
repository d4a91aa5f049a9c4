#!/usr/bin/env python3
"""Compatibility shim: same CLI surface as the reference's
defense_experiments.py, backed by the TPU-native framework (see
image_recognition_adversarial_example_attack_tpu/cli/defense_experiments.py)."""

import sys

from image_recognition_adversarial_example_attack_tpu.cli.defense_experiments import main

if __name__ == "__main__":
    sys.exit(main())
