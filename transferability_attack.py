#!/usr/bin/env python3
"""Compatibility shim: same CLI surface as the reference's transferability_attack.py,
backed by the TPU-native framework (see
image_recognition_adversarial_example_attack_tpu/cli/transferability.py)."""

import sys

from image_recognition_adversarial_example_attack_tpu.cli.transferability import main

if __name__ == "__main__":
    sys.exit(main())
