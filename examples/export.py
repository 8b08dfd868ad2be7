#!/usr/bin/env python
"""Export — the script form of the reference's export-onnx.ipynb.

Loads a checkpoint and exports:
  * a serialized StableHLO forward graph (stochastic — parity with the
    reference's exported reparameterizing graph — and deterministic)
  * torch-layout npz weights

Usage:
    python examples/export.py --run <workdir> [--config <ini>] [--out out/]
    python examples/export.py --torch-ckpt ckpt_00500 --config configs/default.ini
"""

from __future__ import annotations

import argparse
from pathlib import Path

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
    args = ap.parse_args()

    cfg = load_config(args.config or args.run / "config.ini")
    model = build_model(cfg)
    template = model.init(jax.random.PRNGKey(0))
    if args.torch_ckpt:
        from rawaudiovae_kelsey_tpu.compat import load_torch_checkpoint

        params = load_torch_checkpoint(args.torch_ckpt)
    else:
        params = load_params(args.run / "model" / "best_model.npz", template)

    p1 = export_stablehlo(model, params, args.out / "rawaudiovae.stablehlo",
                          batch=args.batch, deterministic=False)
    p2 = export_stablehlo(model, params,
                          args.out / "rawaudiovae_det.stablehlo",
                          batch=args.batch, deterministic=True)
    p3 = export_npz(model, params, args.out / "rawaudiovae_weights.npz")
    for p in (p1, p2, p3):
        print(f"exported {p} ({p.stat().st_size:,} bytes)")


if __name__ == "__main__":
    main()
