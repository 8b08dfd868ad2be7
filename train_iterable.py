#!/usr/bin/env python
"""Reference-compatible streaming trainer entry point (cf. reference
train_iterable.py:34).

Usage: python train_iterable.py --config kelsey_iterable.ini
"""
from rawaudiovae_kelsey_tpu.train.cli import main_stream

if __name__ == "__main__":
    main_stream()
