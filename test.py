#!/usr/bin/env python
"""Top-level evaluation entry point (mirrors the reference's `python test.py`
surface, README.md:44-65)."""
from bayer_low_light_image_enhancement_tpu.cli.test_cli import main

if __name__ == "__main__":
    main()
