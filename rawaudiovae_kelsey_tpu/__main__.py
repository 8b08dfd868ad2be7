"""Unified CLI:  python -m rawaudiovae_kelsey_tpu <command> [...]

Commands:
  train     epoch trainer (reference train.py flow)
  stream    streaming trainer (reference train_iterable.py flow)
  eval      reconstruction MSE of a run         (eval/cli.py)
  tutorial  the creative pipeline               (examples/tutorial.py)
  export    ONNX + StableHLO + npz export       (examples/export.py)
  validate  dataset audit (check_dataset/check_audio)
  serve     HTTP inference service (batched encode/decode/reconstruct)
  som       train a SOM over a wav folder's latents; writes the
            clusters.json/data-concatenated.json artifacts the tutorial's
            cluster workflow consumes (replaces the external mlaudiosalad)

The reference-compatible forms ``python train.py --config x.ini`` and
``python train_iterable.py --config x.ini`` also work at the repo root.
"""

from __future__ import annotations

import sys


def _example_script(cmd: str):
    from pathlib import Path

    return Path(__file__).resolve().parents[1] / "examples" / f"{cmd}.py"


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
    elif cmd == "serve":
        import argparse
        from pathlib import Path

        import jax

        from rawaudiovae_kelsey_tpu.config import load_config
        from rawaudiovae_kelsey_tpu.infer.http import HttpInferenceServer
        from rawaudiovae_kelsey_tpu.models import build_model
        from rawaudiovae_kelsey_tpu.train import load_params

        ap = argparse.ArgumentParser(prog="serve")
        ap.add_argument("--run", type=Path, required=True)
        ap.add_argument("--config", type=Path, default=None)
        ap.add_argument("--params", type=str, default="best")
        ap.add_argument("--host", type=str, default="127.0.0.1")
        ap.add_argument("--port", type=int, default=8422)
        ap.add_argument("--batch-size", type=int, default=256)
        ap.add_argument("--deterministic", action="store_true")
        ap.add_argument("--quantize", action="store_true")
        # the coalesced-batch compiles take ~100 s on a slow tunnel hour —
        # past the 120 s request timeout; production serving compiles them
        # before accepting traffic (the first request would 504 otherwise)
        ap.add_argument("--no-warmup", action="store_true",
                        help="skip compiling the batched paths at startup")
        args = ap.parse_args(rest)
        cfg = load_config(args.config or args.run / "config.ini")
        model = build_model(cfg)
        template = model.init(jax.random.PRNGKey(0))
        params = load_params(
            args.run / "model" / f"{args.params}_model.npz", template
        )
        HttpInferenceServer(
            model, params, sampling_rate=cfg.audio.sampling_rate,
            host=args.host, port=args.port, batch_size=args.batch_size,
            deterministic=args.deterministic, quantize=args.quantize,
            warmup=not args.no_warmup,
        ).serve_forever()
    elif cmd == "som":
        import argparse
        from pathlib import Path

        import jax

        from rawaudiovae_kelsey_tpu.config import load_config
        from rawaudiovae_kelsey_tpu.infer import train_som_for_corpus
        from rawaudiovae_kelsey_tpu.models import build_model
        from rawaudiovae_kelsey_tpu.train import load_params

        ap = argparse.ArgumentParser(prog="som")
        ap.add_argument("--run", type=Path, required=True)
        ap.add_argument("--audio", type=Path, required=True)
        ap.add_argument("--config", type=Path, default=None)
        ap.add_argument("--params", type=str, default="best")
        ap.add_argument("--out", type=Path, default=Path("som"))
        ap.add_argument("--grid", type=str, default="8,8")
        ap.add_argument("--iters", type=int, default=200)
        ap.add_argument("--seed", type=int, default=0)
        args = ap.parse_args(rest)
        cfg = load_config(args.config or args.run / "config.ini")
        model = build_model(cfg)
        template = model.init(jax.random.PRNGKey(0))
        params = load_params(
            args.run / "model" / f"{args.params}_model.npz", template
        )
        gy, gx = (int(t) for t in args.grid.split(","))
        c, d = train_som_for_corpus(
            model, params, args.audio, args.out, cfg.audio.sampling_rate,
            grid=(gy, gx), iters=args.iters, seed=args.seed,
            mono=cfg.dataset.mono,
        )
        print(f"wrote {c}\nwrote {d}")
    elif cmd in ("tutorial", "export"):
        import runpy

        script = _example_script(cmd)
        if not script.exists():
            # Installed as a wheel: examples/ lives in the source tree /
            # sdist, not in site-packages.
            print(f"{cmd}: {script} not found — the example scripts ship "
                  "in the repository (and sdist), not in installed wheels; "
                  f"run from a source checkout or invoke examples/{cmd}.py "
                  "directly.", file=sys.stderr)
            sys.exit(2)
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
