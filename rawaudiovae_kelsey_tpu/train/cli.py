"""Command-line entry points.

Reference-compatible invocation (train.py:32-34, train_iterable.py:34-36):

    python train.py --config default.ini
    python train_iterable.py --config kelsey_iterable.ini

or module form:

    python -m rawaudiovae_kelsey_tpu.train.cli epoch  --config x.ini
    python -m rawaudiovae_kelsey_tpu.train.cli stream --config x.ini
"""

from __future__ import annotations

import argparse
import sys

from rawaudiovae_kelsey_tpu.config import load_config


def main_epoch(argv=None) -> None:
    cfg = _parse(argv)
    from rawaudiovae_kelsey_tpu.train.epoch import train

    train(cfg)


def main_stream(argv=None) -> None:
    cfg = _parse(argv)
    from rawaudiovae_kelsey_tpu.train.stream import train

    train(cfg)


def _parse(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="./default.ini",
                        help="path to the config file")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint of the most "
                             "recent run (new capability)")
    args = parser.parse_args(argv)
    try:
        cfg = load_config(args.config)
    except FileNotFoundError:
        print(f"Config File Not Found at {args.config}")
        sys.exit(1)
    if args.resume:
        cfg.training.resume = True
    return cfg


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] in ("epoch", "stream"):
        mode, rest = argv[0], argv[1:]
    else:
        mode, rest = "epoch", argv
    if mode == "stream":
        main_stream(rest)
    else:
        main_epoch(rest)


if __name__ == "__main__":
    main()
