#!/usr/bin/env python3
"""Compatibility shim: same CLI surface as the reference's blackbox_transfer.py,
backed by the TPU-native framework (see
image_recognition_adversarial_example_attack_tpu/cli/blackbox_transfer.py)."""

import sys

from image_recognition_adversarial_example_attack_tpu.cli.blackbox_transfer import main

if __name__ == "__main__":
    sys.exit(main())
