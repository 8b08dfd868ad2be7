#!/usr/bin/env python
"""A/B the Pallas backward fusion granularity on the real chip.

"full" = one kernel per chain (every operand read once, bigger VMEM
residency); "split" = two kernels per chain.  Run from the repo root:

    python benchmarks/fusion_ab.py [--precision bfloat16|high]

Numbers land in docs/PERF.md; ops/pallas_mlp.py:BWD_FUSION records the
winner.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def rate(fusion: str, precision: str, batch: int = 4096,
         chain: int = 100) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rawaudiovae_kelsey_tpu.config import Config
    from rawaudiovae_kelsey_tpu.models import build_model
    from rawaudiovae_kelsey_tpu.ops import pallas_mlp
    from rawaudiovae_kelsey_tpu.parallel import build_train_step
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    pallas_mlp.BWD_FUSION = fusion       # read at trace time
    cfg = Config()
    cfg.audio.segment_length = 1024
    cfg.vae.n_units = 2048
    cfg.vae.latent_dim = 256
    cfg.training.batch_size = batch
    cfg.tpu.precision = precision
    cfg.tpu.backend = "pallas"
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, opt.init(params), seed=0)
    one = build_train_step(model, cfg, opt, donate=False)

    @jax.jit
    def chain_fn(state, b):
        def body(s, _):
            s, m = one(s, b)
            return s, m["loss"]
        return jax.lax.scan(body, state, None, length=chain)

    b = jnp.asarray(np.random.default_rng(0)
                    .uniform(-1, 1, (batch, 1024)).astype(np.float32))
    s, L = chain_fn(state, b)
    float(jax.device_get(L[-1]))
    best = 0.0
    for _ in range(3):
        # 8 dispatches per timed window so the ~30-130 ms tunnel dispatch
        # latency amortizes (a single chain-100 window is latency-bound)
        t0 = time.perf_counter()
        for _ in range(8):
            s, L = chain_fn(s, b)
        float(jax.device_get(L[-1]))
        best = max(best, 8 * batch * chain / (time.perf_counter() - t0))
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="bfloat16")
    args = ap.parse_args()
    for fusion in ("split", "full"):
        r = rate(fusion, args.precision)
        print(f"{args.precision} {fusion}: {r / 1e6:.3f} M frames/s",
              flush=True)


if __name__ == "__main__":
    main()
