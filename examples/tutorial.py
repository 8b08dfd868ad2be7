#!/usr/bin/env python
"""Tutorial — the script form of the reference's tutorial.ipynb.

Walks the full creative pipeline against a trained run:

  1. load a checkpoint (best_model.npz, or a reference torch ckpt)
  2. pick two audio sources (random-concat from a folder, or SOM clusters)
  3. match their lengths, encode both to latent trajectories
  4. stepwise interpolation (α grid), time-varying sine-α interpolation
  5. decode + resynthesize (flat concat, OLA, and the stretch effect)
  6. write wavs + comparison plots

Usage:
    python examples/tutorial.py --run <workdir> --audio <wav-folder> \
        [--config <ini>] [--out out/] [--som <som-dir>]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from rawaudiovae_kelsey_tpu.config import Config, load_config
from rawaudiovae_kelsey_tpu.infer import (
    concat_random_audio,
    decode_trajectory,
    encode_trajectory,
    flat_concat,
    frame_audio,
    interpolate_stepwise,
    interpolate_timevarying,
    match_audio_size,
    overlap_add,
    sine_alfa,
)
from rawaudiovae_kelsey_tpu.io import write_wav
from rawaudiovae_kelsey_tpu.models import build_model
from rawaudiovae_kelsey_tpu.train import load_params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=Path, required=True,
                    help="run workspace containing model/best_model.npz "
                         "(or a reference torch ckpt via --torch-ckpt)")
    ap.add_argument("--audio", type=Path, required=True,
                    help="folder of wav sources")
    ap.add_argument("--config", type=Path, default=None,
                    help="INI (defaults to <run>/config.ini)")
    ap.add_argument("--torch-ckpt", type=Path, default=None)
    ap.add_argument("--out", type=Path, default=Path("tutorial_out"))
    ap.add_argument("--duration", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg: Config = load_config(args.config or args.run / "config.ini")
    model = build_model(cfg)
    template = model.init(jax.random.PRNGKey(0))
    if args.torch_ckpt:
        from rawaudiovae_kelsey_tpu.compat import load_torch_checkpoint

        params = load_torch_checkpoint(args.torch_ckpt)
    else:
        best = args.run / "model" / "best_model.npz"
        if not best.exists():
            # best_model only appears after save_best_model_after
            best = args.run / "model" / "last_model.npz"
            print(f"best_model.npz not found; using {best.name}")
        params = load_params(best, template)
    sr = cfg.audio.sampling_rate
    args.out.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)

    # -- sources (tutorial cells 24-25): random concat to target duration
    src_a = concat_random_audio(args.audio, args.duration, sr, seed=args.seed)
    src_b = concat_random_audio(args.audio, args.duration, sr,
                                seed=args.seed + 1)
    src_a, src_b = match_audio_size(src_a, src_b, mode="repeat")
    write_wav(args.out / "source_a.wav", src_a, sr)
    write_wav(args.out / "source_b.wav", src_b, sr)

    # -- encode (cell 14)
    mu_a, lv_a = encode_trajectory(model, params, src_a)
    mu_b, lv_b = encode_trajectory(model, params, src_b)
    print(f"trajectories: {mu_a.shape}")

    # -- stepwise morph (cells 16-17)
    morph = interpolate_stepwise(model, params, mu_a, lv_a, mu_b, lv_b,
                                 key=key)
    write_wav(args.out / "morph_stepwise.wav", flat_concat(morph), sr)

    # -- time-varying sine-α morph (cells 36-37)
    tv = interpolate_timevarying(
        model, params, mu_a, lv_a, mu_b, lv_b,
        sine_alfa(20000, cycles=500), key=key,
    )
    write_wav(args.out / "morph_timevarying.wav", flat_concat(tv), sr)

    # -- gentle single-cycle variant (cells 53-54)
    tv2 = interpolate_timevarying(
        model, params, mu_a, lv_a, mu_b, lv_b,
        sine_alfa(20000, cycles=1), key=key,
    )
    write_wav(args.out / "morph_gentle.wav", flat_concat(tv2), sr)

    # -- reconstruction + OLA (quirk #14 extension)
    mu, lv = encode_trajectory(model, params, src_a,
                               hop=cfg.audio.hop_length)
    frames = decode_trajectory(model, params, mu)
    write_wav(args.out / "stretch_effect.wav", flat_concat(frames), sr)
    write_wav(args.out / "recon_ola.wav",
              overlap_add(frames, cfg.audio.hop_length), sr)

    # -- visual QA (cells 21-22)
    try:
        from rawaudiovae_kelsey_tpu.observe.viz import save_comparison

        recon = flat_concat(
            decode_trajectory(
                model, params,
                encode_trajectory(model, params, src_a)[0],
            )
        )
        save_comparison(src_a, recon, sr, args.out / "comparison.png")
    except ImportError:
        print("matplotlib unavailable; skipping plots")

    print(f"wrote outputs to {args.out}/")


if __name__ == "__main__":
    main()
