#!/usr/bin/env python
"""Per-op ULP accounting for the bit-for-float parity claim (VERDICT r2
item 5).

Imports a torch reference checkpoint (the re-typed rawvae/model.py:13-30
architecture at the REAL hyperparameters 1024/2048/256), runs the forward
chain op by op at ``precision=highest`` in both frameworks on identical
inputs, and reports the max ULP distance per op — pinpointing where the
test suite's 2e-6 absolute tolerance (tests/test_model_parity.py) comes
from.

Run on CPU (JAX_PLATFORMS=cpu; true-fp32 dots both sides) or on the TPU
(6-pass fp32 dots vs torch-CPU fp32):

    JAX_PLATFORMS=cpu python benchmarks/ulp_audit.py
    python benchmarks/ulp_audit.py            # device = whatever jax sees

Output: a table (op, max ULP, max abs diff) + one JSON line.  Findings
land in docs/PERF.md's parity section.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SEG, UNITS, LATENT = 1024, 2048, 256
BATCH = 256


def ulp_distance(a: np.ndarray, b: np.ndarray) -> int:
    """Max ULP distance between two fp32 arrays (lexicographic-int trick:
    adjacent representable floats differ by 1)."""
    ai = a.astype(np.float32).view(np.int32).astype(np.int64)
    bi = b.astype(np.float32).view(np.int32).astype(np.int64)
    ai = np.where(ai < 0, np.int64(-(2 ** 31)) - ai, ai)
    bi = np.where(bi < 0, np.int64(-(2 ** 31)) - bi, bi)
    return int(np.abs(ai - bi).max())


def main() -> None:
    import torch

    import jax
    import jax.numpy as jnp

    from rawaudiovae_kelsey_tpu.compat import state_dict_to_params

    torch.manual_seed(0)
    fc1 = torch.nn.Linear(SEG, UNITS)
    fc21 = torch.nn.Linear(UNITS, LATENT)
    fc22 = torch.nn.Linear(UNITS, LATENT)
    fc3 = torch.nn.Linear(LATENT, UNITS)
    fc4 = torch.nn.Linear(UNITS, SEG)
    sd = {}
    for name, mod in (("fc1", fc1), ("fc21", fc21), ("fc22", fc22),
                      ("fc3", fc3), ("fc4", fc4)):
        sd[f"{name}.weight"] = mod.weight.detach()
        sd[f"{name}.bias"] = mod.bias.detach()
    params = jax.tree_util.tree_map(jnp.asarray, state_dict_to_params(sd))

    x_np = np.random.default_rng(0).uniform(
        -1, 1, (BATCH, SEG)).astype(np.float32)
    tx = torch.from_numpy(x_np)

    # ---- torch chain (fp32 CPU — the reference numerics) ----
    with torch.no_grad():
        t = {}
        t["fc1_pre"] = fc1(tx)
        t["relu1"] = torch.relu(t["fc1_pre"])
        t["mu"] = fc21(t["relu1"])
        t["logvar"] = fc22(t["relu1"])
        t["std"] = torch.exp(0.5 * t["logvar"])
        t["fc3_pre"] = fc3(t["mu"])
        t["relu3"] = torch.relu(t["fc3_pre"])
        t["fc4_pre"] = fc4(t["relu3"])
        t["tanh"] = torch.tanh(t["fc4_pre"])
        t = {k: v.numpy() for k, v in t.items()}

    # ---- jax chain at precision=highest, SAME intermediate feeding ----
    # Each op consumes the TORCH upstream value, so the table isolates
    # per-op error instead of accumulating the chain.
    @jax.jit
    def chain(p, x, relu1_t, mu_t, relu3_t):
        with jax.default_matmul_precision("highest"):
            j = {}
            j["fc1_pre"] = x @ p["fc1"]["w"] + p["fc1"]["b"]
            j["relu1"] = jnp.maximum(j["fc1_pre"], 0.0)
            j["mu"] = relu1_t @ p["fc21"]["w"] + p["fc21"]["b"]
            j["logvar"] = relu1_t @ p["fc22"]["w"] + p["fc22"]["b"]
            j["std"] = jnp.exp(0.5 * j["logvar"])
            j["fc3_pre"] = mu_t @ p["fc3"]["w"] + p["fc3"]["b"]
            j["relu3"] = jnp.maximum(j["fc3_pre"], 0.0)
            j["fc4_pre"] = relu3_t @ p["fc4"]["w"] + p["fc4"]["b"]
            j["tanh"] = jnp.tanh(j["fc4_pre"])
            return j

    j = chain(params, jnp.asarray(x_np), jnp.asarray(t["relu1"]),
              jnp.asarray(t["mu"]), jnp.asarray(t["relu3"]))
    j = {k: np.asarray(jax.device_get(v)) for k, v in j.items()}

    # per-op isolation for std/tanh too: they consumed torch inputs above
    # except std (consumes jax logvar) — redo from torch logvar
    j["std"] = np.asarray(jax.device_get(
        jnp.exp(0.5 * jnp.asarray(t["logvar"]))))
    j["tanh"] = np.asarray(jax.device_get(
        jnp.tanh(jnp.asarray(t["fc4_pre"]))))
    j["relu1"] = np.asarray(jax.device_get(
        jnp.maximum(jnp.asarray(t["fc1_pre"]), 0.0)))
    j["relu3"] = np.asarray(jax.device_get(
        jnp.maximum(jnp.asarray(t["fc3_pre"]), 0.0)))

    platform = jax.devices()[0].platform
    rows = []
    print(f"# per-op parity vs torch-CPU fp32 (jax platform={platform}, "
          f"precision=highest, {BATCH}x{SEG}/{UNITS}/{LATENT})")
    print(f"{'op':<10} {'kind':<12} {'max ULP':>8} {'max |Δ|':>12}")
    for op, kind in (("fc1_pre", "matmul"), ("relu1", "elementwise"),
                     ("mu", "matmul"), ("logvar", "matmul"),
                     ("std", "exp"), ("fc3_pre", "matmul"),
                     ("relu3", "elementwise"), ("fc4_pre", "matmul"),
                     ("tanh", "tanh")):
        ulp = ulp_distance(j[op], t[op])
        mad = float(np.abs(j[op] - t[op]).max())
        rows.append({"op": op, "kind": kind, "max_ulp": ulp,
                     "max_abs_diff": mad})
        print(f"{op:<10} {kind:<12} {ulp:>8d} {mad:>12.3e}")

    # end-to-end (chained) deltas — what the test tolerances actually see
    from rawaudiovae_kelsey_tpu.models import vae

    with jax.default_matmul_precision("highest"):
        jmu, jlogvar = jax.jit(vae.encode)(params, jnp.asarray(x_np))
        jrecon = jax.jit(vae.decode)(params, jmu)
    chained = []
    print(f"{'chained':<10} {'':<12} {'max ULP':>8} {'max |Δ|':>12}")
    for name, jv, tv in (("mu", jmu, t["mu"]), ("logvar", jlogvar,
                                                t["logvar"]),
                         ("recon", jrecon, t["tanh"])):
        jv = np.asarray(jax.device_get(jv))
        ulp = ulp_distance(jv, tv)
        mad = float(np.abs(jv - tv).max())
        chained.append({"op": name, "max_ulp": ulp, "max_abs_diff": mad})
        print(f"{name:<10} {'(chained)':<12} {ulp:>8d} {mad:>12.3e}")
    print(json.dumps({"platform": platform, "ops": rows,
                      "chained": chained}))


if __name__ == "__main__":
    main()
