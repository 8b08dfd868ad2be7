"""Unified CLI:  python -m rawaudiovae_kelsey_tpu <command> [...]

Commands:
  train     epoch trainer (reference train.py flow)
  stream    streaming trainer (reference train_iterable.py flow)
  eval      reconstruction MSE of a run         (eval/cli.py)
  tutorial  the creative pipeline               (examples/tutorial.py)
  export    StableHLO + npz export              (examples/export.py)
  validate  dataset audit (check_dataset/check_audio)

The reference-compatible forms ``python train.py --config x.ini`` and
``python train_iterable.py --config x.ini`` also work at the repo root.
"""

from __future__ import annotations

import sys


def main() -> None:
    argv = sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return
    cmd, rest = argv[0], argv[1:]
    if cmd == "train":
        from rawaudiovae_kelsey_tpu.train.cli import main_epoch

        main_epoch(rest)
    elif cmd == "stream":
        from rawaudiovae_kelsey_tpu.train.cli import main_stream

        main_stream(rest)
    elif cmd == "eval":
        from rawaudiovae_kelsey_tpu.eval.cli import main as eval_main

        eval_main(rest)
    elif cmd in ("tutorial", "export"):
        import runpy
        from pathlib import Path

        script = (Path(__file__).resolve().parents[1] / "examples"
                  / f"{cmd}.py")
        sys.argv = [str(script), *rest]
        runpy.run_path(str(script), run_name="__main__")
    elif cmd == "validate":
        import argparse
        from pathlib import Path

        from rawaudiovae_kelsey_tpu.data.validate import validate_dataset

        ap = argparse.ArgumentParser(prog="validate")
        ap.add_argument("folder", type=Path)
        ap.add_argument("--sr", type=int, default=44100)
        ap.add_argument("--deep", action="store_true",
                        help="full decode audit (silent/clipped/non-finite)")
        args = ap.parse_args(rest)
        report = validate_dataset(args.folder, args.sr, deep=args.deep)
        print(report.summary())
        sys.exit(0 if report.ok else 1)
    else:
        print(f"unknown command {cmd!r}\n{__doc__}")
        sys.exit(2)


if __name__ == "__main__":
    main()
