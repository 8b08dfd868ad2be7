#!/usr/bin/env python
"""Export — the script form of the reference's export-onnx.ipynb.

Loads a checkpoint and exports:
  * a real ``rawaudiovae.onnx`` (export-onnx.ipynb cell 11 parity: fixed
    (segment,) input, stochastic reparameterize, outputs recon/mu/logvar) +
    a dynamic-batch deterministic variant — dense family only
  * a serialized StableHLO forward graph (stochastic — parity with the
    reference's exported reparameterizing graph — and deterministic)
  * torch-layout npz weights

Usage:
    python examples/export.py --run <workdir> [--config <ini>] [--out out/]
    python examples/export.py --torch-ckpt ckpt_00500 --config configs/default.ini
    python -m rawaudiovae_kelsey_tpu export --run <workdir> --onnx   # ONNX only
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rawaudiovae_kelsey_tpu.config import load_config
from rawaudiovae_kelsey_tpu.infer import export_npz, export_stablehlo
from rawaudiovae_kelsey_tpu.models import build_model
from rawaudiovae_kelsey_tpu.train import load_params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=Path, default=None)
    ap.add_argument("--config", type=Path, default=None)
    ap.add_argument("--torch-ckpt", type=Path, default=None)
    ap.add_argument("--out", type=Path, default=Path("export_out"))
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--onnx", action="store_true",
                    help="emit only the .onnx artifacts")
    args = ap.parse_args()

    cfg = load_config(args.config or args.run / "config.ini")
    model = build_model(cfg)
    template = model.init(jax.random.PRNGKey(0))
    if args.torch_ckpt:
        from rawaudiovae_kelsey_tpu.compat import load_torch_checkpoint

        params = load_torch_checkpoint(args.torch_ckpt)
    else:
        best = args.run / "model" / "best_model.npz"
        # best_model only appears after save_best_model_after; fall back
        if best.exists():
            model_path = best
        else:
            model_path = args.run / "model" / "last_model.npz"
            print(f"{best.name} not found; exporting {model_path.name}")
        params = load_params(model_path, template)

    paths = []
    if model.name == "dense":
        from rawaudiovae_kelsey_tpu.infer import export_onnx

        # reference-parity graph (fixed (segment,) input, stochastic)
        paths.append(export_onnx(model, params,
                                 args.out / "rawaudiovae.onnx"))
        # dynamic-batch deterministic variant (quirk #13/#18 extensions)
        paths.append(export_onnx(model, params,
                                 args.out / "rawaudiovae_det.onnx",
                                 batch="batch", deterministic=True))
    elif args.onnx:
        raise SystemExit(
            f"--onnx covers the dense reference family only (this run is "
            f"{model.name!r}); drop --onnx for StableHLO + npz export"
        )
    if not args.onnx:
        paths.append(export_stablehlo(
            model, params, args.out / "rawaudiovae.stablehlo",
            batch=args.batch, deterministic=False))
        paths.append(export_stablehlo(
            model, params, args.out / "rawaudiovae_det.stablehlo",
            batch=args.batch, deterministic=True))
        paths.append(export_npz(model, params,
                                args.out / "rawaudiovae_weights.npz"))
    for p in paths:
        print(f"exported {p} ({p.stat().st_size:,} bytes)")


if __name__ == "__main__":
    main()
