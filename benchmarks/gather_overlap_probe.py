"""Can the resident-epoch shuffle gather overlap the step scan?

The round-3 verdict suggested double-buffering the per-epoch block-shuffle
gather against the previous epoch's steps (carry the pre-gathered matrix
through the epoch scan and gather epoch i+1 while epoch i trains).  On a
TPU the TensorCore retires one HLO at a time — only ops XLA lowers to
async DMA (collectives, some copies) truly overlap — so whether a gather
fusion can hide behind a `while` loop is an empirical question, not a
design choice.  This probe measures it directly on the production
workload shape (120 s corpus ≈ 41k frames of seg 1024, batch 4096, bf16,
block shuffle, XLA backend — the `backend=best` resident route).

Four formulations of a G-epoch group.  nocond/dbuf/prod run identical
math with the same shuffle order (all three derive per-epoch permutations
from fold_in(rng, 0x5EED); dbuf additionally issues G+1 gathers per group
— the final one discarded — versus nocond/prod's G).  floor is
intentionally NOT the same program: it scans a fixed matrix shuffled once
with an unrelated PRNGKey(2) and no per-epoch reshuffle — it exists only
as the zero-shuffle-work ceiling, not as a fourth same-math variant:

  prod      — parallel/resident.py's build_resident_epoch as shipped
              (dynamic-k cond masking, pre-gather at the top of each
              epoch body);
  nocond    — same pre-gather, cond masking removed (isolates the
              per-epoch lax.cond/dynamic-k tax);
  dbuf      — double-buffered: the epoch scan carries the current
              epoch's gathered matrix and issues epoch i+1's gather
              in the same body as epoch i's step scan (the verdict's
              suggestion; +1 frame-matrix of HBM residency);
  floor     — step scan over a fixed pre-shuffled matrix, no per-epoch
              permutation or gather at all (the pure-step ceiling).

Run from the repo root on TPU (one variant per subprocess — the tunnel
stochastically loses async-compile RPCs, so four cold compiles in one
process routinely hang; the persistent compile cache makes re-runs warm):
    for v in floor nocond dbuf prod; do
        timeout 420 python benchmarks/gather_overlap_probe.py --only $v
    done

Reference semantics being preserved throughout: per-epoch reshuffle,
train.py:134 (`DataLoader(shuffle=True)`).
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

INI = """
[audio]
sampling_rate = 44100
hop_length = 128
segment_length = 1024
[dataset]
datapath = {d}
test_dataset = test_audio
generate_test = False
[VAE]
latent_dim = 256
n_units = 2048
kl_beta = 0.0001
[training]
epochs = 60
learning_rate = 0.0001
batch_size = 4096
checkpoint_interval = 20
loss_reduction = mean
[extra]
description = gather_overlap_probe
[tpu]
precision = bfloat16
backend = xla
resident_shuffle = block
"""


def timeit(fn, state, data, G, *, chain=8, windows=3):
    # chained dispatch per the tunnel timing rules: warm up, fetch a real
    # value, then time chained dispatches and fetch again.  The state must
    # thread through EVERY call (donate_argnums invalidates the argument
    # buffer, so re-using a window's input state for the next window is a
    # donated-buffer error).
    st, losses = fn(state, data, 0, G)
    float(jax.device_get(losses[0, 0]))
    best = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(chain):
            st, losses = fn(st, data, (w * chain + i) * G, G)
        jax.block_until_ready(losses)
        float(jax.device_get(losses[-1, -1]))
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=41336)
    ap.add_argument("--group", type=int, default=20)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--only", choices=["floor", "nocond", "dbuf", "prod"],
                    default=None)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rawaudiovae_kelsey_tpu.config.ini import load_config
    from rawaudiovae_kelsey_tpu.models.registry import build_model
    from rawaudiovae_kelsey_tpu.parallel import resident as R
    from rawaudiovae_kelsey_tpu.parallel.step import (
        _matmul_precision,
        make_loss_fn,
    )
    from rawaudiovae_kelsey_tpu.train.optim import build_optimizer
    from rawaudiovae_kelsey_tpu.train.state import TrainState
    import functools
    import optax

    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "probe.ini"
        p.write_text(INI.format(d=d))
        cfg = load_config(p)

    G = args.group
    seg = cfg.audio.segment_length
    batch = cfg.training.batch_size
    hop = cfg.audio.hop_length
    n_frames = args.frames
    n_samples = (n_frames - 1) * hop + seg
    nb = n_frames // batch
    blk = R.pick_block_rows(n_frames, nb, batch)
    n_shuffle = n_frames // blk
    used = nb * batch // blk
    print(f"frames={n_frames} nb={nb} block_rows={blk} G={G}")

    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    state0 = TrainState.create(params, optimizer.init(params), seed=0)
    data = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (n_frames, seg),
                          jnp.bfloat16))

    loss_fn = make_loss_fn(model, cfg)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    prec = _matmul_precision(cfg.tpu.precision)

    def body(state, xb):
        k = jax.random.fold_in(state.rng, state.step)
        (loss, _aux), grads = grad_fn(state.params, k, xb)
        grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32),
                                       grads)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        return TrainState(params=optax.apply_updates(state.params, updates),
                          opt_state=opt_state, rng=state.rng,
                          step=state.step + 1), loss.astype(jnp.float32)

    def perms_for(state, epoch0):
        base = jax.random.fold_in(state.rng, 0x5EED)
        keys = jax.vmap(lambda e: jax.random.fold_in(base, e))(
            epoch0 + jnp.arange(G))
        return jax.vmap(
            lambda kk: jax.random.permutation(kk, n_shuffle)[:used])(keys)

    def gather(dat, sel):
        blocks = dat[: n_shuffle * blk].reshape(n_shuffle, blk, seg)
        return blocks[sel].reshape(nb, batch, seg)

    # --- prod: the shipped builder -------------------------------------
    prod, _ = R.build_resident_epoch(model, cfg, optimizer, n_samples,
                                     layout="frames", group_k=G)

    # --- nocond: pre-gather, no dynamic-k masking ----------------------
    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def nocond(state, dat, epoch0, k):
        with jax.default_matmul_precision(prec):
            perms = perms_for(state, jnp.asarray(epoch0))

            def eb(s, i):
                return jax.lax.scan(body, s, gather(dat, perms[i]))

            return jax.lax.scan(eb, state, jnp.arange(G))

    # --- dbuf: double-buffered gather ----------------------------------
    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def dbuf(state, dat, epoch0, k):
        with jax.default_matmul_precision(prec):
            perms = perms_for(state, jnp.asarray(epoch0))
            cur0 = gather(dat, perms[0])

            def eb(carry, i):
                s, cur = carry
                nxt = gather(dat, perms[jnp.minimum(i + 1, G - 1)])
                s, losses = jax.lax.scan(body, s, cur)
                return (s, nxt), losses

            (s, _), losses = jax.lax.scan(eb, (state, cur0),
                                          jnp.arange(G))
            return s, losses

    # --- floor: fixed pre-shuffled matrix, no shuffle work at all ------
    fixed = gather(data, jax.random.permutation(
        jax.random.PRNGKey(2), n_shuffle)[:used])

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def floor(state, dat, epoch0, k):
        with jax.default_matmul_precision(prec):
            def eb(s, i):
                return jax.lax.scan(body, s, fixed)

            return jax.lax.scan(eb, state, jnp.arange(G))

    frames_per_call = nb * batch * G
    variants = [("floor", floor), ("nocond", nocond),
                ("dbuf", dbuf), ("prod", prod)]
    if args.only:
        variants = [(n, f) for n, f in variants if n == args.only]
    # every variant jits with donate_argnums=(0,): the first warmup call
    # DONATES the state's buffers, so each timeit needs its own device
    # copy rebuilt from a host snapshot (passing state0 to all four made
    # the default no-`--only` invocation crash on variant two with a
    # deleted-array error)
    host_state = jax.device_get(state0)
    results = {}
    for name, fn in variants:
        t = timeit(fn, jax.device_put(host_state), data, G,
                   chain=args.chain)
        rate = frames_per_call / t
        results[name] = rate
        print(f"{name:8s} {t * 1e3 / G:7.3f} ms/epoch   "
              f"{rate / 1e6:6.3f} M frames/s")

    if "floor" in results and len(results) > 1:
        fl = results["floor"]
        for name in ("nocond", "dbuf", "prod"):
            if name in results:
                print(f"{name:8s} tax vs floor: "
                      f"{(fl - results[name]) / fl * 100:5.1f}%")


if __name__ == "__main__":
    main()
