"""Train-step tests: loss decreases, microbatch accumulation equivalence,
RNG reproducibility, Adam parity vs torch, mesh sharding on the 8-device CPU
mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.models import build_model
from rawaudiovae_kelsey_tpu.parallel import (
    build_train_step,
    make_mesh,
    named_shardings,
    param_specs,
)
from rawaudiovae_kelsey_tpu.parallel.mesh import batch_sharding
from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer


def small_cfg(**tpu_kw):
    cfg = Config()
    cfg.audio.segment_length = 256
    cfg.audio.hop_length = 64
    cfg.vae.n_units = 128
    cfg.vae.latent_dim = 32
    cfg.training.batch_size = 64
    cfg.training.learning_rate = 1e-3
    for k, v in tpu_kw.items():
        setattr(cfg.tpu, k, v)
    return cfg


def make_state(cfg, seed=0):
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    return model, opt, TrainState.create(params, opt.init(params), seed=seed)


def batch_of(cfg, n=64, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.uniform(-1, 1, (n, cfg.audio.segment_length)).astype(np.float32)
    )


def test_loss_decreases():
    cfg = small_cfg()
    model, opt, state = make_state(cfg)
    step = build_train_step(model, cfg, opt)
    batch = batch_of(cfg)
    losses = []
    for _ in range(100):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.6
    assert int(jax.device_get(state.step)) == 100
    assert all(np.isfinite(losses))


def test_step_reproducible_given_same_state():
    cfg = small_cfg()
    model, opt, _ = make_state(cfg)
    batch = batch_of(cfg)
    outs = []
    for _ in range(2):
        _, _, state = make_state(cfg, seed=0)
        step = build_train_step(model, cfg, opt, donate=False)
        state, m = step(state, batch)
        outs.append((float(m["loss"]),
                     np.asarray(jax.device_get(state.params["fc1"]["w"]))))
    assert outs[0][0] == outs[1][0]
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_metrics_components():
    cfg = small_cfg()
    model, opt, state = make_state(cfg)
    step = build_train_step(model, cfg, opt, donate=False)
    _, m = step(state, batch_of(cfg))
    loss, mse, kld = (float(m[k]) for k in ("loss", "mse", "kld"))
    assert loss == pytest.approx(mse + cfg.vae.kl_beta * kld, rel=1e-5)


def test_microbatch_changes_nothing_but_memory():
    """Grad accumulation over microbatches must produce (nearly) the same
    update as the monolithic batch: same mean gradient, same Adam step.
    RNG differs per microbatch so compare against an explicitly-equivalent
    run: deterministic check via loss trajectory equality at kl_beta=0 and
    logvar-free? Simpler: compare grads math with deterministic eps=0 path
    by zeroing logvar impact — instead we verify the weaker but meaningful
    property: both configurations converge to similar loss."""
    cfg_mono = small_cfg()
    cfg_micro = small_cfg(microbatch_size=16)
    batch = batch_of(cfg_mono, n=64)
    results = []
    for cfg in (cfg_mono, cfg_micro):
        model, opt, state = make_state(cfg, seed=1)
        step = build_train_step(model, cfg, opt)
        for _ in range(20):
            state, m = step(state, batch)
        results.append(float(m["loss"]))
    assert results[1] == pytest.approx(results[0], rel=0.15)


def test_microbatch_ragged_batch_matches_monolithic():
    """A batch not divisible by microbatch_size (the host loader's ragged
    final batch) must produce the SAME loss/grads as the monolithic step:
    the remainder is one extra grad call weighted by its row count.  Noise
    is silenced by pinning logvar ≈ -60 (std ~ 1e-13) so the comparison is
    deterministic."""
    cfg_mono = small_cfg()
    cfg_micro = small_cfg(microbatch_size=7)  # 64 = 9*7 + 1
    batch = batch_of(cfg_mono, n=64)
    results = []
    for cfg in (cfg_mono, cfg_micro):
        model, opt, state = make_state(cfg, seed=1)
        params = dict(state.params)
        params["fc22"] = {
            "w": jnp.zeros_like(state.params["fc22"]["w"]),
            "b": jnp.full_like(state.params["fc22"]["b"], -60.0),
        }
        state = dataclasses.replace(state, params=params)
        step = build_train_step(model, cfg, opt)
        state, m = step(state, batch)
        results.append((state, m))
    (s0, m0), (s1, m1) = results
    assert float(m1["loss"]) == pytest.approx(float(m0["loss"]), rel=1e-5)
    assert float(m1["mse"]) == pytest.approx(float(m0["mse"]), rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            # atol 2e-5: fp32 accumulation-order noise in near-zero grads is
            # amplified by Adam's 1/sqrt(v) normalization
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5
        ),
        s0.params, s1.params,
    )


def test_bfloat16_precision_trains():
    cfg = small_cfg(precision="bfloat16")
    model, opt, state = make_state(cfg)
    step = build_train_step(model, cfg, opt)
    batch = batch_of(cfg)
    losses = []
    for _ in range(20):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # master params stay fp32
    assert state.params["fc1"]["w"].dtype == jnp.float32


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_high_precision_tier(backend):
    """precision=high — bf16 3-pass (XLA) / hi-lo-split or HIGHEST-pinned
    kernels (Pallas) — must track the 6-pass fp32 loss closely and train.
    On TPU this tier measures ~2× the 6-pass throughput (docs/PERF.md)."""
    batch = batch_of(small_cfg())
    losses = {}
    for prec in ("highest", "high"):
        cfg = small_cfg(precision=prec, backend=backend)
        model, opt, state = make_state(cfg, seed=1)
        step = build_train_step(model, cfg, opt, donate=False)
        _, m = step(state, batch)
        losses[prec] = float(m["loss"])
        assert np.isfinite(losses[prec])
    assert losses["high"] == pytest.approx(losses["highest"], rel=1e-3)


def test_unknown_precision_rejected():
    cfg = small_cfg(precision="fp8")
    with pytest.raises(ValueError, match="unknown precision"):
        cfg.validate()


def test_adam_update_parity_with_torch():
    """One full step (forward/backward/Adam) against torch on identical
    weights, batch, and a deterministic latent (logvar path exercised, eps
    forced to zero by setting deterministic sampling through kl only).
    We compare gradients of the deterministic part by disabling sampling:
    torch side uses z = mu too."""
    torch = pytest.importorskip("torch")
    seg, units, latent = 64, 96, 16
    cfg = Config()
    cfg.audio.segment_length = seg
    cfg.audio.hop_length = 16
    cfg.vae.n_units = units
    cfg.vae.latent_dim = latent
    cfg.vae.kl_beta = 1e-4
    cfg.training.learning_rate = 1e-3
    cfg.tpu.deterministic_inference = True

    # torch model
    tm = torch.nn.ModuleDict({
        "fc1": torch.nn.Linear(seg, units),
        "fc21": torch.nn.Linear(units, latent),
        "fc22": torch.nn.Linear(units, latent),
        "fc3": torch.nn.Linear(latent, units),
        "fc4": torch.nn.Linear(units, seg),
    })
    torch.manual_seed(0)
    from rawaudiovae_kelsey_tpu.compat import state_dict_to_params

    params = jax.tree_util.tree_map(
        jnp.asarray,
        state_dict_to_params({k: v for k, v in tm.state_dict().items()}),
    )

    x_np = np.random.default_rng(0).uniform(-1, 1, (32, seg)).astype(np.float32)

    # --- torch step (z = mu deterministic) ---
    topt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    tx = torch.from_numpy(x_np)
    h = torch.relu(tm["fc1"](tx))
    mu, logvar = tm["fc21"](h), tm["fc22"](h)
    recon = torch.tanh(tm["fc4"](torch.relu(tm["fc3"](mu))))
    loss = torch.nn.functional.mse_loss(recon, tx) + 1e-4 * (
        -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())
    )
    topt.zero_grad()
    loss.backward()
    topt.step()

    # --- jax step with the same deterministic graph ---
    from rawaudiovae_kelsey_tpu.models import vae
    import optax

    def loss_fn(p):
        m, lv = vae.encode(p, jnp.asarray(x_np))
        rec = vae.decode(p, m)  # z = mu
        return vae.loss_fn(rec, jnp.asarray(x_np), m, lv, 1e-4, seg)

    with jax.default_matmul_precision("highest"):
        jloss, grads = jax.value_and_grad(loss_fn)(params)
        opt = optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)
        opt_state = opt.init(params)
        updates, _ = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

    assert float(jloss) == pytest.approx(loss.item(), abs=2e-6)
    # compare updated fc1 weight
    np.testing.assert_allclose(
        np.asarray(new_params["fc1"]["w"]).T,
        tm["fc1"].weight.detach().numpy(),
        atol=5e-6, rtol=1e-4,
    )


def test_mesh_data_parallel_step():
    """Full train step over the 8-device CPU mesh with batch sharded on
    'data' — validates that sharded update == replicated semantics."""
    cfg = small_cfg()
    model, opt, state = make_state(cfg, seed=2)
    mesh = make_mesh()  # 8x1
    specs = param_specs(model.name, state.params, 1)
    sharded_params = jax.device_put(state.params, named_shardings(mesh, specs))
    sh_state = TrainState.create(sharded_params, opt.init(sharded_params),
                                 seed=2)
    step_sharded = build_train_step(model, cfg, opt, mesh=mesh, donate=False)
    step_plain = build_train_step(model, cfg, opt, donate=False)

    batch = batch_of(cfg, n=64, seed=3)
    sharded_batch = jax.device_put(batch, batch_sharding(mesh))
    s1, m1 = step_sharded(sh_state, sharded_batch)
    s0, m0 = step_plain(state, batch)
    assert float(m1["loss"]) == pytest.approx(float(m0["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(s1.params["fc1"]["w"])),
        np.asarray(jax.device_get(s0.params["fc1"]["w"])),
        atol=1e-6,
    )


def test_mesh_model_parallel_dense():
    """2-way tensor parallel on the dense model over a 4x2 mesh."""
    cfg = small_cfg(model_parallel=2)
    model, opt, state = make_state(cfg, seed=4)
    mesh = make_mesh(data_parallel=4, model_parallel=2)
    specs = param_specs(model.name, state.params, 2)
    sharded_params = jax.device_put(state.params, named_shardings(mesh, specs))
    # fc1 w sharded over model axis on dim 1
    assert sharded_params["fc1"]["w"].sharding.spec == specs["fc1"]["w"]
    sh_state = TrainState.create(sharded_params, opt.init(sharded_params),
                                 seed=4)
    step = build_train_step(model, cfg, opt, mesh=mesh, donate=False)
    batch = jax.device_put(batch_of(cfg, n=64, seed=5), batch_sharding(mesh))
    s1, m1 = step(sh_state, batch)

    _, _, ref_state = make_state(cfg, seed=4)
    ref_step = build_train_step(model, cfg, opt, donate=False)
    s0, m0 = ref_step(ref_state, batch_of(cfg, n=64, seed=5))
    assert float(m1["loss"]) == pytest.approx(float(m0["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(s1.params["fc4"]["w"])),
        np.asarray(jax.device_get(s0.params["fc4"]["w"])),
        atol=1e-5,  # collective accumulation-order noise
    )


def test_remat_matches_plain():
    """jax.checkpoint rematerialization changes memory, not numerics."""
    cfg_plain = small_cfg()
    cfg_remat = small_cfg(remat=True)
    batch = batch_of(cfg_plain)
    outs = []
    for cfg in (cfg_plain, cfg_remat):
        model, opt, state = make_state(cfg, seed=6)
        step = build_train_step(model, cfg, opt, donate=False)
        state, m = step(state, batch)
        outs.append((float(m["loss"]),
                     np.asarray(jax.device_get(state.params["fc1"]["w"]))))
    assert outs[0][0] == outs[1][0]
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_tpu_prng_mode_trains():
    """[tpu] rng = tpu_prng: on-chip sampling inside the step (threefry
    fallback off-TPU); training still converges and is per-step
    deterministic."""
    cfg = small_cfg(rng="tpu_prng")
    model, opt, state = make_state(cfg, seed=3)
    step = build_train_step(model, cfg, opt, donate=False)
    batch = batch_of(cfg)
    s1, m1 = step(state, batch)
    s2, m2 = step(state, batch)
    assert float(m1["loss"]) == float(m2["loss"])
    losses = []
    for _ in range(60):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_shard_map_step_matches_gspmd_semantics():
    """Explicit-collective dp step (shard_map + pmean) trains equivalently
    to the GSPMD-annotated step; params stay replicated bit-identically
    across shards."""
    from rawaudiovae_kelsey_tpu.parallel import build_shard_map_train_step

    cfg = small_cfg()
    model, opt, state = make_state(cfg, seed=11)
    mesh = make_mesh()  # 8x1
    step_sm = build_shard_map_train_step(model, cfg, opt, mesh, donate=False)
    step_ref = build_train_step(model, cfg, opt, donate=False)

    batch = batch_of(cfg, n=64, seed=12)
    sharded_batch = jax.device_put(batch, batch_sharding(mesh))
    losses_sm, losses_ref = [], []
    s_sm = TrainState.create(state.params, opt.init(state.params), seed=11)
    s_ref = TrainState.create(state.params, opt.init(state.params), seed=11)
    for _ in range(20):
        s_sm, m_sm = step_sm(s_sm, sharded_batch)
        s_ref, m_ref = step_ref(s_ref, batch)
        losses_sm.append(float(m_sm["loss"]))
        losses_ref.append(float(m_ref["loss"]))
    # different eps partitioning → trajectories agree statistically, tightly
    np.testing.assert_allclose(losses_sm, losses_ref, rtol=0.05)
    assert losses_sm[-1] < losses_sm[0]
    # replicated output state: every shard holds identical params
    w = s_sm.params["fc1"]["w"]
    shards = [np.asarray(si.data) for si in w.addressable_shards]
    for sh in shards[1:]:
        np.testing.assert_array_equal(shards[0], sh)


def test_resident_epoch_sharded_over_mesh():
    """Mesh-sharded device-resident epochs: whole epoch on the 8-device mesh
    in one jitted call, one pmean per step; params stay replicated and loss
    decreases across epochs."""
    from rawaudiovae_kelsey_tpu.data.framing import overlapping_frames
    from rawaudiovae_kelsey_tpu.parallel.resident import (
        build_resident_epoch_sharded,
        pad_frames_for_mesh,
        put_frames_sharded,
    )

    cfg = small_cfg()
    cfg.training.batch_size = 64
    model, opt, state = make_state(cfg, seed=7)
    mesh = make_mesh()  # 8x1
    rng = np.random.default_rng(7)
    t = np.arange(40_000) / 44100.0
    corpus = (0.5 * np.sin(2 * np.pi * 220 * t)
              + 0.05 * rng.standard_normal(40_000)).astype(np.float32)
    frames = np.asarray(
        overlapping_frames(corpus, cfg.audio.segment_length,
                           cfg.audio.hop_length)
    )
    frames = pad_frames_for_mesh(frames, 8)
    dev_frames = put_frames_sharded(frames, cfg, mesh)
    assert dev_frames.sharding.spec[0] is not None  # really sharded

    run_epochs, n_batches = build_resident_epoch_sharded(
        model, cfg, opt, len(frames), mesh, group_k=4
    )
    assert n_batches == len(frames) // 64
    epoch_means, per_epoch = [], []
    for epoch in range(4):
        state, losses = run_epochs(state, dev_frames, epoch)
        losses = np.asarray(jax.device_get(losses))
        # fixed-group graph: always group_k rows, the masked tail is NaN
        assert losses.shape == (4, n_batches)
        assert np.isnan(losses[1:]).all()
        per_epoch.append(losses[0])
        epoch_means.append(float(losses[0].mean()))
    assert epoch_means[-1] < epoch_means[0]
    assert np.isfinite(epoch_means).all()
    # a k-grouped dispatch replays the same epochs bit-identically —
    # pins that masked tails leave the carried state untouched
    _, _, state_g = make_state(cfg, seed=7)
    state_g, losses_g = run_epochs(state_g, dev_frames, 0, k=4)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(losses_g)), np.stack(per_epoch)
    )
    # params replicated bit-identically across all 8 devices
    w = state.params["fc1"]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for sh in shards[1:]:
        np.testing.assert_array_equal(shards[0], sh)

    # indivisible batch is rejected
    cfg_bad = small_cfg()
    cfg_bad.training.batch_size = 60
    with pytest.raises(ValueError, match="not divisible"):
        build_resident_epoch_sharded(model, cfg_bad, opt, len(frames), mesh)


def test_resident_epoch_single_device_kgroup_replay():
    """The non-sharded resident builder (the path taken when ctx.mesh is
    None) must also replay k-grouped epochs bit-identically to per-epoch
    dispatch — pins the epoch indexing (epoch0 + arange(k)) and the RNG
    carry of the grouped scan."""
    from rawaudiovae_kelsey_tpu.parallel.resident import (
        build_resident_epoch,
        put_resident,
    )

    cfg = small_cfg()
    cfg.training.batch_size = 64
    model, opt, state = make_state(cfg, seed=3)
    rng = np.random.default_rng(3)
    corpus = (0.4 * np.sin(np.arange(40_000) / 30.0)
              + 0.05 * rng.standard_normal(40_000)).astype(np.float32)
    run_epochs, n_batches = build_resident_epoch(
        model, cfg, opt, len(corpus), layout="frames", group_k=3
    )
    dev = put_resident(corpus, cfg, "frames")
    per_epoch = []
    s = state
    for epoch in range(3):
        s, losses = run_epochs(s, dev, epoch)
        losses = np.asarray(jax.device_get(losses))
        assert losses.shape == (3, n_batches)
        assert np.isnan(losses[1:]).all()
        per_epoch.append(losses[0])
    _, _, s_g = make_state(cfg, seed=3)
    s_g, losses_g = run_epochs(s_g, dev, 0, k=3)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(losses_g)), np.stack(per_epoch)
    )


def test_resident_epoch_block_shuffle():
    """resident_shuffle = block: the block-granular shuffle must (a) train
    (finite decreasing-ish losses), (b) replay k-grouped identically to
    per-epoch dispatch, and (c) draw every batch from whole contiguous
    blocks of the frame matrix."""
    from rawaudiovae_kelsey_tpu.parallel.resident import (
        build_resident_epoch,
        pick_block_rows,
        put_resident,
    )

    cfg = small_cfg(resident_shuffle="block")
    cfg.training.batch_size = 64
    model, opt, state = make_state(cfg, seed=3)
    rng = np.random.default_rng(3)
    corpus = (0.4 * np.sin(np.arange(40_000) / 30.0)
              + 0.05 * rng.standard_normal(40_000)).astype(np.float32)
    run_epochs, n_batches = build_resident_epoch(
        model, cfg, opt, len(corpus), layout="frames", group_k=3
    )
    dev = put_resident(corpus, cfg, "frames")
    s, losses = run_epochs(state, dev, 0, k=3)
    losses = np.asarray(jax.device_get(losses))
    assert losses.shape == (3, n_batches)
    assert np.isfinite(losses).all()
    # replay: per-epoch dispatch sequence == one grouped dispatch
    _, _, s2 = make_state(cfg, seed=3)
    per_epoch = []
    for epoch in range(3):
        s2, l = run_epochs(s2, dev, epoch)
        per_epoch.append(np.asarray(jax.device_get(l))[0])
    np.testing.assert_array_equal(losses, np.stack(per_epoch))
    # block height: divides the batch, covers all batches
    from rawaudiovae_kelsey_tpu.data.framing import overlapping_frame_count
    n_frames = overlapping_frame_count(
        len(corpus), cfg.audio.segment_length, cfg.audio.hop_length)
    blk = pick_block_rows(n_frames, n_batches, cfg.training.batch_size)
    assert blk > 1 and cfg.training.batch_size % blk == 0
    assert (n_frames // blk) * blk >= n_batches * cfg.training.batch_size


def test_wrap_pad_contracts():
    """Wrap-pad helpers: mesh padding delegates to the same body, an empty
    host's frame block fails loudly (a silently-short array would desync
    this process from its peers and hang their next collective)."""
    from rawaudiovae_kelsey_tpu.parallel.resident import (
        _wrap_pad_to,
        pad_frames_for_mesh,
    )

    out = pad_frames_for_mesh(np.arange(24, dtype=np.float32).reshape(3, 8), 4)
    assert out.shape == (4, 8)
    np.testing.assert_array_equal(out[3], out[0])  # wrap, not zeros
    # already divisible → untouched
    sq = np.arange(32, dtype=np.float32).reshape(4, 8)
    np.testing.assert_array_equal(pad_frames_for_mesh(sq, 4), sq)
    with pytest.raises(ValueError, match="no frames"):
        _wrap_pad_to(np.zeros((0, 8), np.float32), 16)
    # zero target on an empty block stays a harmless no-op
    assert pad_frames_for_mesh(np.zeros((0, 8), np.float32), 4).shape[0] == 0


def test_two_pass_shuffle_mixes_shards():
    """The global resident shuffle must land an equal slice of every origin
    shard on every chip, and preserve the global row multiset."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rawaudiovae_kelsey_tpu.parallel.mesh import DATA_AXIS
    from rawaudiovae_kelsey_tpu.parallel.resident import _two_pass_shuffle

    mesh = make_mesh()  # 8x1
    n_shards = mesh.shape[DATA_AXIS]
    n_local, seg = 24, 4
    # row value = origin shard id (constant per shard block)
    frames = np.repeat(
        np.arange(n_shards, dtype=np.float32), n_local
    ).reshape(n_shards * n_local, 1) * np.ones((1, seg), np.float32)
    dev = jax.device_put(frames, NamedSharding(mesh, P(DATA_AXIS, None)))

    def per_shard(x):
        shard = jax.lax.axis_index(DATA_AXIS)
        key = jax.random.fold_in(jax.random.PRNGKey(0), shard)
        return _two_pass_shuffle(x, key, DATA_AXIS, n_shards)

    shuffled = jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=P(DATA_AXIS, None), out_specs=P(DATA_AXIS, None),
        check_vma=False,
    ))(dev)

    for i, s in enumerate(shuffled.addressable_shards):
        origins = np.asarray(s.data)[:, 0].astype(int)
        counts = np.bincount(origins, minlength=n_shards)
        # exactly n_local/n_shards rows from every origin shard
        np.testing.assert_array_equal(
            counts, np.full(n_shards, n_local // n_shards)
        )
    # global multiset preserved
    all_origins = np.asarray(shuffled)[:, 0].astype(int)
    np.testing.assert_array_equal(
        np.bincount(all_origins, minlength=n_shards),
        np.full(n_shards, n_local),
    )


def test_resident_sharded_local_shuffle_mode():
    """resident_shuffle = local (no collective) still trains."""
    from rawaudiovae_kelsey_tpu.data.framing import overlapping_frames
    from rawaudiovae_kelsey_tpu.parallel.resident import (
        build_resident_epoch_sharded,
        pad_frames_for_mesh,
        put_frames_sharded,
    )

    cfg = small_cfg(resident_shuffle="local")
    cfg.training.batch_size = 64
    model, opt, state = make_state(cfg, seed=3)
    mesh = make_mesh()
    t = np.arange(30_000) / 44100.0
    corpus = (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    frames = pad_frames_for_mesh(
        np.asarray(overlapping_frames(corpus, cfg.audio.segment_length,
                                      cfg.audio.hop_length)), 8
    )
    dev_frames = put_frames_sharded(frames, cfg, mesh)
    run_epochs, n_batches = build_resident_epoch_sharded(
        model, cfg, opt, len(frames), mesh, group_k=1
    )
    means = []
    for epoch in range(3):
        state, losses = run_epochs(state, dev_frames, epoch)
        means.append(float(np.asarray(jax.device_get(losses)).mean()))
    assert means[-1] < means[0] and np.isfinite(means).all()


def test_perf_recipe_combination_trains():
    """The shipped perf-first recipe (configs/perf_bf16.ini) stacks three
    opt-in knobs — device-resident epochs, block-granular shuffle, on-chip
    PRNG.  Each is tested in isolation elsewhere; this pins the
    COMBINATION the recipe actually ships."""
    from rawaudiovae_kelsey_tpu.parallel.resident import (
        build_resident_epoch,
        put_resident,
    )

    cfg = small_cfg(resident_shuffle="block", rng="tpu_prng")
    cfg.training.batch_size = 64
    model, opt, state = make_state(cfg, seed=5)
    rng = np.random.default_rng(5)
    corpus = (0.4 * np.sin(np.arange(40_000) / 25.0)
              + 0.05 * rng.standard_normal(40_000)).astype(np.float32)
    run_epochs, n_batches = build_resident_epoch(
        model, cfg, opt, len(corpus), layout="frames", group_k=4
    )
    dev = put_resident(corpus, cfg, "frames")
    state, losses = run_epochs(state, dev, 0, k=4)
    losses = np.asarray(jax.device_get(losses))
    assert losses.shape == (4, n_batches)
    assert np.isfinite(losses).all()
    # training makes progress across the grouped epochs
    assert losses[-1].mean() < losses[0].mean()


def test_tpu_prng_active_under_mesh():
    """VERDICT r4 item 3: rng=tpu_prng is mesh-sound — under the 8-device
    mesh the shard_map-wrapped kernel runs (NOT the threefry fallback the
    round-3 gate forced), the loss is deterministic, and it differs from
    the threefry stream (proving the knob is actually active)."""
    from rawaudiovae_kelsey_tpu.parallel.step import make_loss_fn

    cfg = small_cfg()
    cfg.tpu.rng = "tpu_prng"
    model, opt, state = make_state(cfg, seed=3)
    mesh = make_mesh()  # 8 devices
    loss_fn = jax.jit(make_loss_fn(model, cfg, mesh=mesh))
    batch = batch_of(cfg, n=16, seed=1)
    loss, _ = loss_fn(state.params, jax.random.PRNGKey(0), batch)
    loss_b, _ = loss_fn(state.params, jax.random.PRNGKey(0), batch)
    assert float(loss) == float(loss_b)          # deterministic
    assert np.isfinite(float(loss))
    cfg2 = small_cfg()                           # threefry reference
    loss_tf, _ = jax.jit(make_loss_fn(model, cfg2, mesh=mesh))(
        state.params, jax.random.PRNGKey(0), batch)
    assert float(loss) != float(loss_tf)         # different eps stream


def test_tpu_prng_indivisible_batch_falls_back(capsys):
    """A batch that doesn't divide the data axis can't enter shard_map —
    it must fall back to threefry loudly, not crash."""
    from rawaudiovae_kelsey_tpu.parallel.step import make_loss_fn

    cfg = small_cfg()
    cfg.tpu.rng = "tpu_prng"
    model, opt, state = make_state(cfg, seed=3)
    mesh = make_mesh()
    loss_fn = make_loss_fn(model, cfg, mesh=mesh)
    batch = batch_of(cfg, n=9, seed=1)           # 9 % 8 != 0
    loss, _ = jax.jit(loss_fn)(state.params, jax.random.PRNGKey(0), batch)
    assert "does not divide" in capsys.readouterr().out
    cfg2 = small_cfg()
    loss2, _ = jax.jit(make_loss_fn(model, cfg2, mesh=mesh))(
        state.params, jax.random.PRNGKey(0), batch)
    assert float(loss) == float(loss2)           # bit-equal to threefry


def test_sharded_reparameterize_decorrelated_across_shards():
    """Statistical soundness of the per-shard seed fold: with mu=0,
    logvar=0, z IS eps.  Across the 8-device mesh every shard's draw is
    distinct, the pooled sample is standard-normal to sampling tolerance,
    and cross-shard correlation is noise-level — at every mesh width
    (shard-count-invariant soundness; the concrete stream is documented to
    change with the mesh, like any reshard of a counter-based PRNG)."""
    from rawaudiovae_kelsey_tpu.ops import sharded_pallas_reparameterize

    rows_per_shard, latent = 64, 128
    for n_shards in (2, 4, 8):
        mesh = make_mesh(devices=jax.devices()[:n_shards])
        n = n_shards * rows_per_shard
        mu = jnp.zeros((n, latent), jnp.float32)
        logvar = jnp.zeros((n, latent), jnp.float32)
        seed = np.asarray([12345, 678], np.int32)
        eps = np.asarray(jax.jit(
            lambda s, m, lv: sharded_pallas_reparameterize(
                s, m, lv, mesh, "data")
        )(seed, mu, logvar))
        shards = eps.reshape(n_shards, rows_per_shard * latent)
        # pairwise distinct + decorrelated
        for i in range(n_shards):
            for j in range(i + 1, n_shards):
                assert not np.array_equal(shards[i], shards[j])
                r = np.corrcoef(shards[i], shards[j])[0, 1]
                assert abs(r) < 0.05, (n_shards, i, j, r)
        # pooled moments: N(0,1) to sampling error (n*latent >= 16384)
        assert abs(eps.mean()) < 0.05
        assert abs(eps.std() - 1.0) < 0.05
        # determinism per (seed, mesh)
        eps2 = np.asarray(jax.jit(
            lambda s, m, lv: sharded_pallas_reparameterize(
                s, m, lv, mesh, "data")
        )(seed, mu, logvar))
        np.testing.assert_array_equal(eps, eps2)


def test_perf_recipe_ini_runs_on_mesh():
    """VERDICT r4 item 3 done-criterion: configs/perf_bf16.ini runs
    UNMODIFIED on the virtual 8-device mesh with rng=tpu_prng active."""
    from pathlib import Path

    from rawaudiovae_kelsey_tpu.config import load_config
    from rawaudiovae_kelsey_tpu.parallel.mesh import batch_sharding

    ini = Path(__file__).resolve().parents[1] / "configs" / "perf_bf16.ini"
    cfg = load_config(ini)
    assert cfg.tpu.rng == "tpu_prng"
    # shrink shapes only (not knobs) so the CPU-mesh step stays fast
    cfg.audio.segment_length = 256
    cfg.vae.n_units = 128
    cfg.vae.latent_dim = 32
    cfg.training.batch_size = 64
    model, opt, state = make_state(cfg, seed=0)
    mesh = make_mesh()
    step = build_train_step(model, cfg, opt, mesh=mesh, donate=False)
    batch = jax.device_put(batch_of(cfg), batch_sharding(mesh))
    losses = []
    for _ in range(20):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_pallas_reparameterize_uses_both_seed_words():
    """Review regression: the kernel must consume both key words — a
    truncated 32-bit seed would birthday-collide over long runs, replaying
    identical noise tensors."""
    from rawaudiovae_kelsey_tpu.ops import pallas_reparameterize

    mu = np.zeros((8, 16), np.float32)
    logvar = np.zeros((8, 16), np.float32)
    same_low_a = np.asarray([7, 1], np.int32)
    same_low_b = np.asarray([7, 2], np.int32)
    za = np.asarray(pallas_reparameterize(same_low_a, mu, logvar))
    zb = np.asarray(pallas_reparameterize(same_low_b, mu, logvar))
    assert not np.array_equal(za, zb)  # second word matters
    za2 = np.asarray(pallas_reparameterize(same_low_a, mu, logvar))
    np.testing.assert_array_equal(za, za2)  # still deterministic
