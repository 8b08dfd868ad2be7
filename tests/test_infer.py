"""Inference API tests: trajectories, interpolation modes, SOM consumption,
audio utils, resynthesis, export, and the batched server."""

import json

import numpy as np
import pytest

import jax

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.infer import (
    InferenceServer,
    SomClusters,
    concat_audio_som,
    concat_random_audio,
    decode_trajectory,
    encode_trajectory,
    export_npz,
    export_stablehlo,
    flat_concat,
    frame_audio,
    interpolate_stepwise,
    interpolate_timevarying,
    load_stablehlo,
    match_audio_size,
    overlap_add,
    reconstruct,
    sample_z,
    sine_alfa,
    stretch_alfa,
)
from rawaudiovae_kelsey_tpu.io import write_wav
from rawaudiovae_kelsey_tpu.models import build_model

SEG, LATENT = 256, 16


@pytest.fixture(scope="module")
def model_and_params():
    cfg = Config()
    cfg.audio.segment_length = SEG
    cfg.audio.hop_length = 64
    cfg.vae.n_units = 64
    cfg.vae.latent_dim = LATENT
    model = build_model(cfg)
    return model, model.init(jax.random.PRNGKey(0))


def _audio(n=SEG * 10, seed=0):
    return np.random.default_rng(seed).uniform(-0.8, 0.8, n).astype(np.float32)


def test_encode_trajectory_shapes(model_and_params):
    model, params = model_and_params
    audio = _audio(SEG * 10 + 100)  # non-multiple length → padded frame
    mu, logvar = encode_trajectory(model, params, audio, batch_size=4)
    assert mu.shape == (11, LATENT) and logvar.shape == (11, LATENT)
    # frames path gives the same result
    mu2, _ = encode_trajectory(model, params,
                               frame_audio(audio, SEG), batch_size=4)
    np.testing.assert_allclose(mu, mu2, atol=1e-6)


def test_encode_trajectory_rejects_channel_matrix(model_and_params):
    # read_wav returns (samples, channels); passing that straight through
    # used to die inside the encoder's matmul with an opaque dot_general
    # shape error.  It must be a clear ValueError naming the fix.
    model, params = model_and_params
    wave_2ch = _audio(SEG * 4).reshape(-1, 2)
    with pytest.raises(ValueError, match=r"wave\[:, 0\]"):
        encode_trajectory(model, params, wave_2ch)
    with pytest.raises(ValueError, match="expected a 1-D waveform"):
        encode_trajectory(model, params, _audio(SEG * 3).reshape(3, 1, SEG))


def test_decode_roundtrip_shapes(model_and_params):
    model, params = model_and_params
    z = np.random.default_rng(1).standard_normal((7, LATENT)).astype(np.float32)
    frames = decode_trajectory(model, params, z, batch_size=3)
    assert frames.shape == (7, SEG)
    assert np.abs(frames).max() <= 1.0


def test_interpolate_stepwise_contract(model_and_params):
    """Cells 16-17: default α grid has 6 steps; output concatenates each
    decoded trajectory; α=0 end decodes trajectory A distribution."""
    model, params = model_and_params
    a, b = _audio(SEG * 4, 1), _audio(SEG * 4, 2)
    mu_a, lv_a = encode_trajectory(model, params, a)
    mu_b, lv_b = encode_trajectory(model, params, b)
    out = interpolate_stepwise(model, params, mu_a, lv_a, mu_b, lv_b,
                               deterministic=True)
    assert out.shape == (6 * 4, SEG)
    # α=0 block equals decoding mu_a directly (deterministic)
    np.testing.assert_allclose(
        out[:4], decode_trajectory(model, params, mu_a), atol=1e-6
    )
    # mismatched trajectories are rejected
    with pytest.raises(ValueError, match="match_audio_size"):
        interpolate_stepwise(model, params, mu_a[:2], lv_a[:2], mu_b, lv_b)


def test_interpolate_timevarying(model_and_params):
    model, params = model_and_params
    a, b = _audio(SEG * 6, 3), _audio(SEG * 6, 4)
    mu_a, lv_a = encode_trajectory(model, params, a)
    mu_b, lv_b = encode_trajectory(model, params, b)
    alfa = sine_alfa(n_points=2000, cycles=3)
    out = interpolate_timevarying(model, params, mu_a, lv_a, mu_b, lv_b,
                                  alfa, deterministic=True)
    assert out.shape == (6, SEG)
    # α≡0 reduces to decoding trajectory A
    out0 = interpolate_timevarying(model, params, mu_a, lv_a, mu_b, lv_b,
                                   np.zeros(10), deterministic=True)
    np.testing.assert_allclose(
        out0, decode_trajectory(model, params, mu_a), atol=1e-6
    )


def test_sine_and_stretch_alfa():
    a = sine_alfa(1000, cycles=2, lo=0.0, hi=1.0)
    assert a.min() >= 0.0 and a.max() <= 1.0
    s = stretch_alfa(a, 137)
    assert s.shape == (137,)
    assert s[0] == pytest.approx(a[0], abs=1e-6)
    assert s[-1] == pytest.approx(a[-1], abs=1e-6)


def test_sampling_modes(model_and_params):
    mu = np.ones((5, LATENT), np.float32)
    logvar = np.full((5, LATENT), -2.0, np.float32)
    np.testing.assert_array_equal(sample_z(None, mu, logvar), mu)
    z1 = sample_z(jax.random.PRNGKey(1), mu, logvar)
    z2 = sample_z(jax.random.PRNGKey(1), mu, logvar)
    np.testing.assert_array_equal(z1, z2)
    assert not np.array_equal(z1, mu)


def test_match_audio_size_modes():
    a, b = np.arange(10, dtype=np.float32), np.arange(4, dtype=np.float32)
    ar, br = match_audio_size(a, b, mode="repeat")
    assert len(ar) == len(br) == 10
    np.testing.assert_array_equal(br, np.concatenate([b, b, b[:2]]))
    ac, bc = match_audio_size(a, b, mode="crop")
    assert len(ac) == len(bc) == 4


def test_concat_random_audio(tmp_path):
    for i in range(3):
        write_wav(tmp_path / f"f{i}.wav",
                  np.full(5000, 0.1 * (i + 1), np.float32), 44100)
    out = concat_random_audio(tmp_path, duration_s=0.5, sampling_rate=44100,
                              seed=0)
    assert len(out) == 22050
    out2 = concat_random_audio(tmp_path, 0.5, 44100, seed=0)
    np.testing.assert_array_equal(out, out2)  # seeded → reproducible


def test_som_cluster_consumption(tmp_path):
    """clusters.json / data-concatenated.json contract (cells 28-29)."""
    root = tmp_path / "wavs"
    root.mkdir()
    lens = {}
    for i in range(4):
        n = 1000 + i * 500
        write_wav(root / f"s{i}.wav", np.full(n, 0.2, np.float32), 22050)
        lens[i] = n
    (tmp_path / "clusters.json").write_text(
        json.dumps({"18": [0, 2], "24": [1, 3]})
    )
    (tmp_path / "data.json").write_text(
        json.dumps({str(i): [{"meta": i}, f"s{i}.wav"] for i in range(4)})
    )
    som = SomClusters(tmp_path / "clusters.json", tmp_path / "data.json")
    assert som.cluster_ids() == [18, 24]
    audio = som.concat_audio(root, 18)
    assert len(audio) == lens[0] + lens[2]
    with pytest.raises(KeyError):
        som.cluster_files(99)
    # reference-signature function form
    audio2 = concat_audio_som(root, 22050, 24, som.clusters, som.data)
    assert len(audio2) == lens[1] + lens[3]


def test_flat_concat_and_stretch(model_and_params):
    model, params = model_and_params
    audio = _audio(SEG * 4)
    frames = reconstruct(model, params, audio, deterministic=True)
    wave = flat_concat(frames)
    assert wave.shape == (SEG * 4,)
    # overlapping encode (hop=64) + flat decat → ~4× longer (stretch mode)
    mu, lv = encode_trajectory(model, params, audio, hop=64)
    stretched = flat_concat(decode_trajectory(model, params, mu))
    assert len(stretched) == (len(frame_audio(audio, SEG, 64))) * SEG
    assert len(stretched) > 3 * len(wave)


def test_overlap_add_reconstructs_constant():
    """COLA property: OLA of constant frames = constant signal."""
    seg, hop = 256, 64
    frames = np.ones((9, seg), np.float32) * 0.5
    out = overlap_add(frames, hop)
    assert out.shape == ((9 - 1) * hop + seg,)
    # sample 0 has zero window coverage (hann(0) = 0); everything else exact
    np.testing.assert_allclose(out[1:], 0.5, atol=1e-6)
    # rect window too
    np.testing.assert_allclose(overlap_add(frames, hop, window="rect"),
                               0.5, atol=1e-6)


def test_export_npz_torch_layout(model_and_params, tmp_path):
    model, params = model_and_params
    p = export_npz(model, params, tmp_path / "weights.npz")
    with np.load(p) as npz:
        assert "fc1.weight" in npz.files
        assert npz["fc1.weight"].shape == (64, SEG)  # torch (out, in) layout


def test_export_stablehlo_roundtrip(model_and_params, tmp_path):
    model, params = model_and_params
    p = export_stablehlo(model, params, tmp_path / "vae.stablehlo",
                         batch=2, deterministic=True)
    fn = load_stablehlo(p)
    x = np.random.default_rng(0).uniform(-1, 1, (2, SEG)).astype(np.float32)
    # full reference VAE.forward contract: (recon, mu, logvar)
    recon, mu_out, logvar_out = fn(x)
    mu, logvar = encode_trajectory(model, params,
                                   frame_audio(x.reshape(-1), SEG))
    expect = decode_trajectory(model, params, mu)
    np.testing.assert_allclose(np.asarray(recon), expect, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu_out), mu, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar_out), logvar, atol=1e-5)


def test_server_batched_requests(model_and_params):
    model, params = model_and_params
    with InferenceServer(model, params, batch_size=8,
                         deterministic=True) as srv:
        futs = [srv.reconstruct(_audio(SEG * 3, seed=i)) for i in range(5)]
        enc = srv.encode(_audio(SEG * 2, seed=9))
        waves = [f.result(timeout=60) for f in futs]
        mu, logvar = enc.result(timeout=60)
    assert all(w.shape == (SEG * 3,) for w in waves)
    assert mu.shape == (2, LATENT)
    # batching must not mix results across requests: compare to direct path
    direct = flat_concat(
        reconstruct(model, params, _audio(SEG * 3, seed=2),
                    deterministic=True)
    )
    np.testing.assert_allclose(waves[2], direct, atol=1e-5)


def test_server_ola_mode(model_and_params):
    model, params = model_and_params
    with InferenceServer(model, params, batch_size=8,
                         deterministic=True) as srv:
        wave = srv.reconstruct(_audio(SEG * 4), hop=64, ola=True).result(60)
    n_frames = len(frame_audio(_audio(SEG * 4), SEG, 64))
    assert wave.shape == ((n_frames - 1) * 64 + SEG,)


def test_server_not_started(model_and_params):
    model, params = model_and_params
    srv = InferenceServer(model, params)
    with pytest.raises(RuntimeError, match="not started"):
        srv.encode(_audio())


def test_encode_trajectory_sharded(model_and_params):
    """Long-waveform encode sharded over the 8-device mesh equals the
    single-device trajectory (SURVEY §5.7 context-parallel analog)."""
    from rawaudiovae_kelsey_tpu.infer.api import encode_trajectory_sharded
    from rawaudiovae_kelsey_tpu.parallel import make_mesh

    model, params = model_and_params
    audio = _audio(SEG * 37 + 100, seed=11)  # padded, non-divisible count
    mesh = make_mesh()
    mu_s, lv_s = encode_trajectory_sharded(model, params, audio, mesh,
                                           batch_frames=16)
    mu_r, lv_r = encode_trajectory(model, params, audio)
    assert mu_s.shape == mu_r.shape
    np.testing.assert_allclose(mu_s, mu_r, atol=1e-5)
    np.testing.assert_allclose(lv_s, lv_r, atol=1e-5)


def test_ola_roundtrip_of_overlapping_frames():
    """Property: OLA of the overlapping frames of x reconstructs x exactly
    in the fully-covered interior (identity through frame→OLA, no model)."""
    seg, hop = 256, 64
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.9, 0.9, seg * 6).astype(np.float32)
    frames = frame_audio(x, seg, hop)
    y = overlap_add(frames, hop)
    # interior: after the first (seg - hop) warmup samples windows fully cover
    lo, hi = seg, len(x) - seg
    np.testing.assert_allclose(y[lo:hi], x[lo:hi], atol=1e-5)


def test_som_training_separates_blobs():
    """Batch SOM on separable blobs: units specialize, assignments recover
    the blobs."""
    from rawaudiovae_kelsey_tpu.infer import assign_clusters, train_som

    rng = np.random.default_rng(0)
    centers = np.array([[5, 0, 0, 0], [-5, 0, 0, 0], [0, 8, 0, 0]], np.float32)
    feats = np.concatenate([
        c + 0.3 * rng.standard_normal((30, 4)).astype(np.float32)
        for c in centers
    ])
    codebook = train_som(feats, grid=(3, 3), iters=120, seed=1)
    assert codebook.shape == (9, 4)
    assignments = assign_clusters(feats, codebook)
    # all members of one blob land on the same unit, blobs on distinct units
    blobs = [set(assignments[i * 30:(i + 1) * 30].tolist()) for i in range(3)]
    assert all(len(b) <= 2 for b in blobs)          # tight specialization
    firsts = [assignments[i * 30] for i in range(3)]
    assert len(set(firsts)) == 3                     # blobs separated


def test_som_artifacts_roundtrip_reference_schema(model_and_params, tmp_path):
    """train_som_for_corpus writes clusters.json/data-concatenated.json that
    SomClusters (and so the reference notebook's concat_audio_som) consume."""
    from rawaudiovae_kelsey_tpu.infer import SomClusters, train_som_for_corpus

    model, params = model_and_params
    audio_dir = tmp_path / "wavs"
    audio_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(6):
        # two families of content: tones vs noise
        if i % 2 == 0:
            wave = 0.5 * np.sin(np.linspace(0, 150 * (i + 1), SEG * 4))
        else:
            wave = rng.uniform(-0.5, 0.5, SEG * 4)
        write_wav(audio_dir / f"s{i}.wav", wave.astype(np.float32), 44100)

    clusters_path, data_path = train_som_for_corpus(
        model, params, audio_dir, tmp_path / "som", 44100,
        grid=(2, 2), iters=60,
    )
    som = SomClusters(clusters_path, data_path)
    ids = som.cluster_ids()
    assert ids  # at least one populated cluster
    total = sum(len(som.clusters[str(c)]) for c in ids)
    assert total == 6
    # artifacts resolve back to audio via the reference consumption path
    audio = som.concat_audio(audio_dir, ids[0], sr=44100)
    assert len(audio) >= SEG * 4


def test_sine_alfa_reference_range():
    """Review regression: the reference lerps with the RAW sine in [-1, 1]
    (tutorial cell 36) — extrapolation past the endpoints is part of the
    effect — so that must be the default."""
    from rawaudiovae_kelsey_tpu.infer import sine_alfa

    a = sine_alfa(4000, cycles=10.0)
    assert a.min() == pytest.approx(-1.0, abs=1e-3)
    assert a.max() == pytest.approx(1.0, abs=1e-3)
    b = sine_alfa(4000, cycles=10.0, lo=0.0)
    assert b.min() >= 0.0


def test_overlap_add_nonoverlapping_is_exact():
    """Review regression: hop == segment zeroed one sample per frame (the
    periodic hann's first sample) — non-overlapping OLA must be exact."""
    from rawaudiovae_kelsey_tpu.infer import overlap_add

    rng = np.random.default_rng(0)
    frames = rng.uniform(-1, 1, (5, 64)).astype(np.float32)
    out = overlap_add(frames, hop=64)
    np.testing.assert_allclose(out, frames.reshape(-1), atol=1e-6)


def test_interpolate_rejects_broadcastable_logvar(model_and_params):
    """Review regression: a (1, latent) logvar must not silently broadcast."""
    from rawaudiovae_kelsey_tpu.infer import interpolate_stepwise

    model, params = model_and_params
    mu = np.zeros((10, LATENT), np.float32)
    bad_lv = np.zeros((1, LATENT), np.float32)
    with pytest.raises(ValueError, match="logvar"):
        interpolate_stepwise(model, params, mu, bad_lv, mu, bad_lv,
                             deterministic=True)


def test_som_dead_units_hold_position():
    """Review regression: units that win no samples must hold their position
    instead of decaying to the origin (where they'd steal small-norm
    features at assignment time)."""
    from rawaudiovae_kelsey_tpu.infer.som_train import train_som

    rng = np.random.default_rng(1)
    # all data in a tight cluster far from the origin
    feats = (rng.normal(0, 0.05, (200, 8)) + 10.0).astype(np.float32)
    codebook = train_som(feats, grid=(6, 6), iters=60, seed=0)
    norms = np.linalg.norm(codebook, axis=1)
    # nothing collapsed toward zero
    assert norms.min() > 1.0


def test_overlap_add_stream_bit_identical():
    """OverlapAddStream's chunked emission must concatenate to EXACTLY
    overlap_add's output for every chunking (same float64 accumulation
    order per sample), including chunk sizes smaller than the overlap
    depth and a trailing partial chunk."""
    from rawaudiovae_kelsey_tpu.infer.synthesis import OverlapAddStream

    seg, hop = 256, 64
    rng = np.random.default_rng(3)
    frames = rng.uniform(-1, 1, (23, seg)).astype(np.float32)
    want = overlap_add(frames, hop)
    for chunk in (1, 2, 5, 7, 23, 40):
        stream = OverlapAddStream(hop)
        pieces = [stream.add(frames[i:i + chunk])
                  for i in range(0, len(frames), chunk)]
        pieces.append(stream.finish())
        got = np.concatenate([p for p in pieces if p.size])
        np.testing.assert_array_equal(got, want), chunk
    # rect window path too
    want_rect = overlap_add(frames, hop, window="rect")
    stream = OverlapAddStream(hop, window="rect")
    got = np.concatenate([stream.add(frames[:11]), stream.add(frames[11:]),
                          stream.finish()])
    np.testing.assert_array_equal(got, want_rect)


def test_server_reconstruct_stream_matches_whole(model_and_params):
    """InferenceServer.reconstruct_stream: ordered chunk concatenation ==
    the one-shot reconstruct (deterministic mode), for flat and OLA."""
    model, params = model_and_params
    audio = _audio(SEG * 9, seed=4)
    with InferenceServer(model, params, batch_size=8,
                         deterministic=True) as srv:
        whole = srv.reconstruct(audio).result(120)
        n, gen = srv.reconstruct_stream(audio, chunk_frames=2, timeout=120)
        assert n == 9
        np.testing.assert_array_equal(np.concatenate(list(gen)), whole)

        whole_ola = srv.reconstruct(audio, hop=64, ola=True).result(120)
        n, gen = srv.reconstruct_stream(audio, hop=64, ola=True,
                                        chunk_frames=5, timeout=120)
        np.testing.assert_array_equal(np.concatenate(list(gen)), whole_ola)


def test_overlap_add_stream_rejects_gapped_hop():
    """hop > segment would make add() emit n*hop samples from an
    (n-1)*hop+seg buffer (numpy clamps the slice silently -> short,
    non-matching audio) — the stream refuses gapped layouts loudly."""
    from rawaudiovae_kelsey_tpu.infer.synthesis import OverlapAddStream

    frames = np.zeros((3, 64), np.float32)
    stream = OverlapAddStream(hop=128)
    with pytest.raises(ValueError, match="hop <= segment"):
        stream.add(frames)
    # hop == segment is the valid non-overlapping boundary
    stream = OverlapAddStream(hop=64)
    got = np.concatenate([stream.add(frames), stream.finish()])
    assert got.shape == (3 * 64,)
