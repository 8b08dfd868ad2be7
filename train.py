#!/usr/bin/env python
"""Reference-compatible epoch trainer entry point (cf. reference train.py:32).

Usage: python train.py --config default.ini
"""
from rawaudiovae_kelsey_tpu.train.cli import main_epoch

if __name__ == "__main__":
    main_epoch()
