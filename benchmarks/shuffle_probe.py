"""Resident-epoch overhead breakdown: where do 3.75 vs 4.65 M frames/s go?

Times, dispatch-amortized on TPU, for the resident-epoch workload shape
(n_frames ~41k of seg 1024, batch 4096 → 10 steps/epoch):

  * per-epoch ``jax.random.permutation(key, n)`` — a device sort;
  * the same permutation BATCHED over a whole epoch group (one argsort of a
    (G, n) uniform matrix, G=64): candidate hoist for
    ``parallel/resident.py`` — batched rows fill the VPU sublanes a serial
    per-epoch sort leaves idle;
  * the whole-matrix shuffle gather ``data[sel]``;
  * 10 chained train steps (the epoch's compute floor).

Run from the repo root on TPU:
    python benchmarks/shuffle_probe.py [--frames 41336] [--group 64]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(fn, *args, chain=20, windows=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(*args)
        jax.block_until_ready(out)
        float(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=41336)
    ap.add_argument("--seg", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--group", type=int, default=64)
    args = ap.parse_args()
    n, seg, batch, G = args.frames, args.seg, args.batch, args.group
    nb = n // batch

    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (n, seg), jnp.bfloat16)

    @jax.jit
    def perm_one(k):
        return jax.random.permutation(k, n)

    @jax.jit
    def perm_batched(k):
        keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(jnp.arange(G))
        u = jax.vmap(lambda kk: jax.random.uniform(kk, (n,)))(keys)
        return jnp.argsort(u, axis=1)

    @jax.jit
    def gather(sel):
        return data[sel[: nb * batch]].reshape(nb, batch, seg).sum(
            dtype=jnp.float32)

    sel = perm_one(key)

    t_perm = timeit(perm_one, key)
    t_bat = timeit(perm_batched, key, chain=5)
    t_gather = timeit(gather, sel)
    print(f"n_frames={n} batch={batch} nb={nb} group={G}")
    print(f"jax.random.permutation (per epoch): {t_perm*1e3:8.3f} ms")
    print(f"batched argsort ({G} epochs, total): {t_bat*1e3:8.3f} ms "
          f"-> {t_bat/G*1e3:8.3f} ms/epoch "
          f"({t_perm/(t_bat/G):.1f}x cheaper)")
    print(f"whole-matrix shuffle gather:        {t_gather*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
