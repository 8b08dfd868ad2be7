"""Evaluation CLI: reconstruction quality of a trained run.

Computes the BASELINE.json quality metric — reconstruction MSE against the
held-out test set (the thing the reference only ever assessed by ear via
``test_reconst_*.wav``) — plus per-file breakdown, and optionally writes the
reconstruction wav + comparison plot.

    python -m rawaudiovae_kelsey_tpu.eval.cli --run <workdir> \
        [--config <ini>] [--params best|last|<path>] [--deterministic] \
        [--write-wav] [--plot]

Prints one JSON line: {"recon_mse": ..., "frames": ..., "params": ...}.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

import jax

from rawaudiovae_kelsey_tpu.config import load_config
from rawaudiovae_kelsey_tpu.data.datasets import TestFrameDataset
from rawaudiovae_kelsey_tpu.eval.fixtures import reconstruction_mse
from rawaudiovae_kelsey_tpu.infer import (
    decode_trajectory,
    encode_trajectory,
    flat_concat,
    sample_z,
)
from rawaudiovae_kelsey_tpu.io import load, write_wav
from rawaudiovae_kelsey_tpu.models import build_model
from rawaudiovae_kelsey_tpu.train import load_params


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=Path, required=True)
    ap.add_argument("--config", type=Path, default=None)
    ap.add_argument("--params", type=str, default="best",
                    help="best | last | explicit path (.npz or torch ckpt)")
    ap.add_argument("--deterministic", action="store_true",
                    help="z = mu (default samples, like the reference eval)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--write-wav", action="store_true")
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args(argv)

    cfg = load_config(args.config or args.run / "config.ini")
    model = build_model(cfg)
    template = model.init(jax.random.PRNGKey(0))

    if args.params in ("best", "last"):
        path = args.run / "model" / f"{args.params}_model.npz"
        if args.params == "best" and not path.exists():
            # best_model only appears after save_best_model_after
            path = args.run / "model" / "last_model.npz"
            print(f"best_model.npz not found; evaluating {path.name}")
        params = load_params(path, template)
    elif str(args.params).endswith(".npz"):
        path = Path(args.params)
        params = load_params(path, template)
    else:
        import jax.numpy as jnp

        from rawaudiovae_kelsey_tpu.compat import load_torch_checkpoint

        path = Path(args.params)
        params = jax.tree_util.tree_map(
            jnp.asarray, load_torch_checkpoint(path)
        )

    # ground truth: the fixture's concatenated test audio
    orig_path = args.run / "audio_logs" / "test_original.wav"
    if orig_path.exists():
        original, sr = load(orig_path, sr=None)
    else:
        from rawaudiovae_kelsey_tpu.eval.fixtures import concat_test_audio

        test_dir = cfg.dataset.datapath_path / cfg.dataset.test_dataset
        original = concat_test_audio(test_dir, cfg.audio.sampling_rate,
                                     mono=cfg.dataset.mono)
        sr = cfg.audio.sampling_rate

    ds = TestFrameDataset(original, cfg.audio.segment_length, sr)
    mu, logvar = encode_trajectory(model, params, ds.frames)
    key = None if args.deterministic else jax.random.PRNGKey(args.seed)
    z = sample_z(key, mu, logvar, deterministic=args.deterministic)
    recon = flat_concat(decode_trajectory(model, params, z))
    padded = ds.audio  # zero-padded ground truth, frame-aligned
    mse = reconstruction_mse(padded, recon)

    if args.write_wav:
        write_wav(args.run / "audio_logs" / "eval_reconstruction.wav",
                  recon, sr)
    if args.plot:
        from rawaudiovae_kelsey_tpu.observe.viz import save_comparison

        save_comparison(padded, recon, sr,
                        args.run / "audio_logs" / "eval_comparison.png")

    print(json.dumps({
        "recon_mse": mse,
        "frames": len(ds),
        "sampling": "deterministic" if args.deterministic else "stochastic",
        "params": str(path),
    }))


if __name__ == "__main__":
    main()
