#!/usr/bin/env python
"""Top-level training entry point (mirrors the reference's `python train.py`
surface, README.md:44-65)."""
from bayer_low_light_image_enhancement_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
