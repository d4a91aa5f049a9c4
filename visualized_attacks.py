#!/usr/bin/env python3
"""Compatibility shim: same CLI surface as the reference's visualized_attacks.py,
backed by the TPU-native framework (see
image_recognition_adversarial_example_attack_tpu/cli/visualize.py)."""

import sys

from image_recognition_adversarial_example_attack_tpu.cli.visualize import main

if __name__ == "__main__":
    sys.exit(main())
