"""HTTP inference service tests: the real socket surface, concurrent
clients, every endpoint, malformed inputs."""

import http.client
import io
import tempfile
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import pytest

import jax

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.infer import HttpInferenceServer
from rawaudiovae_kelsey_tpu.io import read_wav, write_wav
from rawaudiovae_kelsey_tpu.models import build_model

SEG, LATENT = 256, 16


@pytest.fixture(scope="module")
def server():
    cfg = Config()
    cfg.audio.segment_length = SEG
    cfg.audio.hop_length = 64
    cfg.vae.n_units = 64
    cfg.vae.latent_dim = LATENT
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    with HttpInferenceServer(model, params, sampling_rate=44100,
                             port=0, batch_size=16,
                             deterministic=True) as srv:
        yield srv


def _wav_body(n=SEG * 4, seed=0):
    wave = np.random.default_rng(seed).uniform(-0.8, 0.8, n).astype(np.float32)
    with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
        write_wav(tmp.name, wave, 44100)
        return wave, Path(tmp.name).read_bytes()


def _post(port, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=body)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def _wav_from_bytes(data):
    with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
        Path(tmp.name).write_bytes(data)
        out, sr = read_wav(tmp.name)
    return out[:, 0], sr


def test_healthz(server):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    import json

    info = json.loads(resp.read())
    assert info["status"] == "ok"
    assert info["segment_length"] == SEG
    conn.close()


def test_reconstruct_endpoint(server):
    wave, body = _wav_body()
    status, ctype, data = _post(server.port, "/reconstruct", body)
    assert status == 200 and ctype == "audio/wav"
    out, sr = _wav_from_bytes(data)
    assert sr == 44100 and out.shape == (SEG * 4,)
    assert np.abs(out).max() <= 1.0


def test_encode_decode_roundtrip(server):
    wave, body = _wav_body(seed=3)
    status, _, enc = _post(server.port, "/encode", body)
    assert status == 200
    with np.load(io.BytesIO(enc)) as npz:
        mu, logvar = npz["mu"], npz["logvar"]
    assert mu.shape == (4, LATENT)

    buf = io.BytesIO()
    np.savez(buf, z=mu)
    status, ctype, dec = _post(server.port, "/decode", buf.getvalue())
    assert status == 200 and ctype == "audio/wav"
    out, _ = _wav_from_bytes(dec)
    assert out.shape == (SEG * 4,)


def test_concurrent_clients_get_their_own_audio(server):
    """Batched underneath, isolated per request."""
    waves_bodies = [_wav_body(seed=i) for i in range(6)]

    def roundtrip(i):
        _, _, data = _post(server.port, "/reconstruct", waves_bodies[i][1])
        return _wav_from_bytes(data)[0]

    with ThreadPoolExecutor(6) as pool:
        outs = list(pool.map(roundtrip, range(6)))
    # deterministic server → same input twice gives identical output;
    # different inputs give different outputs
    again = roundtrip(2)
    np.testing.assert_array_equal(outs[2], again)
    assert not np.array_equal(outs[0], outs[1])


def test_ola_query(server):
    wave, body = _wav_body()
    status, _, data = _post(server.port, "/reconstruct?hop=64&ola=1", body)
    assert status == 200
    out, _ = _wav_from_bytes(data)
    n_frames = (SEG * 4 - SEG) // 64 + 1
    assert out.shape == ((n_frames - 1) * 64 + SEG,)


def test_bad_wav_body_is_400(server):
    status, _, data = _post(server.port, "/reconstruct", b"not a wav at all")
    assert status == 400
    assert b"bad wav body" in data


def test_bad_npz_key_is_400(server):
    buf = io.BytesIO()
    np.savez(buf, wrong_name=np.zeros((2, LATENT), np.float32))
    status, _, data = _post(server.port, "/decode", buf.getvalue())
    assert status == 400
    assert b"missing array" in data


def test_unknown_path_is_404(server):
    status, _, _ = _post(server.port, "/nope", b"")
    assert status == 404


def test_stress_mixed_kinds_no_races(server):
    """SURVEY §5.2 (race detection — absent in the reference): hammer the
    batched worker with interleaved request kinds from many threads; every
    future must resolve with its own correct result."""
    rng = np.random.default_rng(9)
    backend = server.backend

    def job(i):
        kind = i % 3
        if kind == 0:
            wave = rng.uniform(-0.5, 0.5, SEG * 2).astype(np.float32)
            mu, logvar = backend.encode(wave).result(120)
            assert mu.shape == (2, LATENT)
            return ("enc", mu)
        if kind == 1:
            z = np.full((3, LATENT), (i % 7) / 7.0, np.float32)
            frames = backend.decode(z).result(120)
            assert frames.shape == (3, SEG)
            return ("dec", frames)
        wave = np.full(SEG * 2, 0.1 * (i % 5), np.float32)
        out = backend.reconstruct(wave).result(120)
        assert out.shape == (SEG * 2,)
        return ("rec", out)

    with ThreadPoolExecutor(12) as pool:
        results = list(pool.map(job, range(36)))
    # identical decode inputs must give identical outputs (no cross-request
    # contamination in the coalesced batches)
    decs = {}
    for i, (kind, out) in enumerate(results):
        if kind == "dec":
            key = i % 7
            if key in decs:
                np.testing.assert_array_equal(decs[key], out)
            else:
                decs[key] = out


def test_bad_hop_is_400(server):
    """hop=0 (ZeroDivision), negative hop, and non-divisor hops are client
    errors, not 500s (review regression)."""
    import json

    _, body = _wav_body()
    for hop in (0, -64, 7):
        status, _, data = _post(server.port, f"/reconstruct?hop={hop}", body)
        assert status == 400, (hop, status, data)
        assert "hop" in json.loads(data)["error"]


def test_short_audio_hop_mode_is_consistent_empty(server):
    """Audio shorter than one segment in hop mode is a well-defined empty
    answer — the same whether or not the request coalesced (review
    regression: alone it 500'd with 'tuple index out of range')."""
    backend = server.backend
    short = np.full(100, 0.2, np.float32)
    out = backend.reconstruct(short, hop=64).result(120)
    assert out.shape == (0,)
    mu, logvar = backend.encode(short, hop=64).result(120)
    assert mu.shape == (0, LATENT) and logvar.shape == (0, LATENT)


def test_malformed_prebatched_request_fails_only_itself(server):
    """A 2-D submission with the wrong frame width must fail in the caller's
    thread, never poisoning innocent requests coalesced into its group
    (review regression)."""
    backend = server.backend
    with pytest.raises(ValueError, match="pre-framed"):
        backend.encode(np.zeros((2, SEG + 5), np.float32))
    # the server still works for everyone else
    wave = np.full(SEG * 2, 0.1, np.float32)
    out = backend.reconstruct(wave).result(120)
    assert out.shape == (SEG * 2,)


def test_backend_restarts_after_stop():
    """start() after stop() must bring the worker back (review regression:
    the stop event was never cleared, leaving a permanently dead server);
    start() on a live server must not spawn a second racing worker."""
    cfg = Config()
    cfg.audio.segment_length = SEG
    cfg.vae.n_units = 32
    cfg.vae.latent_dim = LATENT
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(1))
    from rawaudiovae_kelsey_tpu.infer import InferenceServer

    srv = InferenceServer(model, params, batch_size=8).start()
    t_first = srv._thread
    assert srv.start()._thread is t_first  # idempotent, no second worker
    wave = np.full(SEG, 0.1, np.float32)
    assert srv.reconstruct(wave).result(120).shape == (SEG,)
    srv.stop()
    with pytest.raises(RuntimeError, match="not started"):
        srv.reconstruct(wave)
    srv.start()
    assert srv.reconstruct(wave).result(120).shape == (SEG,)
    srv.stop()


def test_oversized_body_is_413(server):
    """A huge declared Content-Length is rejected before buffering."""
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.putrequest("POST", "/reconstruct")
    conn.putheader("Content-Length", str(1 << 33))
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()


def _npz_body(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def test_interpolate_stepwise_endpoint(server):
    """BASELINE config #5's 'interpolate': the α=0 section of the stepwise
    grid must equal the plain reconstruction of source A (deterministic
    server, z = mu), and each grid point contributes one trajectory."""
    wave_a, wav_bytes_a = _wav_body(n=SEG * 4, seed=10)
    wave_b, _ = _wav_body(n=SEG * 4, seed=11)

    status, ctype, data = _post(
        server.port, "/interpolate?alphas=0,0.5,1",
        _npz_body(a=wave_a, b=wave_b))
    assert status == 200 and ctype == "audio/wav"
    out, sr = _wav_from_bytes(data)
    assert sr == 44100
    assert out.shape == (3 * 4 * SEG,)

    status, _, recon = _post(server.port, "/reconstruct", wav_bytes_a)
    assert status == 200
    recon_a, _ = _wav_from_bytes(recon)
    np.testing.assert_allclose(out[: 4 * SEG], recon_a, atol=1e-6)


def test_interpolate_default_grid_and_mismatched_lengths(server):
    """Default α grid is the reference's arange(0, 1.1, 0.2) — 6 points —
    and sources are trimmed to the shorter trajectory (match_audio_size)."""
    wave_a, _ = _wav_body(n=SEG * 5, seed=12)
    wave_b, _ = _wav_body(n=SEG * 3, seed=13)
    status, _, data = _post(server.port, "/interpolate",
                            _npz_body(a=wave_a, b=wave_b))
    assert status == 200
    out, _ = _wav_from_bytes(data)
    assert out.shape == (6 * 3 * SEG,)


def test_interpolate_timevarying_endpoint(server):
    """An alfa curve in the body selects time-varying mode: ONE trajectory,
    curve stretched to its length (tutorial cells 36-37)."""
    wave_a, _ = _wav_body(n=SEG * 4, seed=14)
    wave_b, _ = _wav_body(n=SEG * 4, seed=15)
    alfa = np.linspace(-1.0, 1.0, 7).astype(np.float32)  # raw-sine range
    status, _, data = _post(server.port, "/interpolate",
                            _npz_body(a=wave_a, b=wave_b, alfa=alfa))
    assert status == 200
    out, _ = _wav_from_bytes(data)
    assert out.shape == (4 * SEG,)


def test_interpolate_sine_mode(server):
    wave_a, _ = _wav_body(n=SEG * 2, seed=16)
    wave_b, _ = _wav_body(n=SEG * 2, seed=17)
    status, _, data = _post(server.port, "/interpolate?mode=sine&cycles=2",
                            _npz_body(a=wave_a, b=wave_b))
    assert status == 200
    out, _ = _wav_from_bytes(data)
    assert out.shape == (2 * SEG,)


def test_interpolate_missing_source_is_400(server):
    wave_a, _ = _wav_body(n=SEG * 2, seed=18)
    status, _, data = _post(server.port, "/interpolate",
                            _npz_body(a=wave_a))
    assert status == 400
    assert b"'a' and 'b'" in data


def test_interpolate_matches_api_composition(server):
    """The server's decomposed interpolate (encode→mix→decode through the
    coalescing queue) must equal the inference API composed directly."""
    from rawaudiovae_kelsey_tpu.infer.api import (
        encode_trajectory,
        interpolate_stepwise,
    )
    from rawaudiovae_kelsey_tpu.infer.synthesis import flat_concat

    backend = server.backend
    rng = np.random.default_rng(19)
    wave_a = rng.uniform(-0.8, 0.8, SEG * 3).astype(np.float32)
    wave_b = rng.uniform(-0.8, 0.8, SEG * 3).astype(np.float32)
    alphas = [0.0, 0.25, 0.75]

    got = backend.interpolate(wave_a, wave_b, alphas=alphas).result(120)

    model, params = backend.model, backend.params
    mu_a, logvar_a = encode_trajectory(model, params, wave_a)
    mu_b, logvar_b = encode_trajectory(model, params, wave_b)
    frames = interpolate_stepwise(model, params, mu_a, logvar_a,
                                  mu_b, logvar_b, alphas=alphas,
                                  deterministic=True)
    np.testing.assert_allclose(got, flat_concat(frames), atol=1e-6)


def test_stream_reconstruct_matches_full(server):
    """VERDICT r4 item 6: /reconstruct?stream=1 must yield byte-identical
    WAV output to the non-streaming path (deterministic mode), with a
    correct Content-Length and a spec-complete header — chunking changes
    WHEN bytes arrive, never WHAT they are."""
    wave, body = _wav_body(SEG * 11 + 37, seed=7)
    st_full, _, full = _post(server.port, "/reconstruct", body)
    st_stream, ctype, stream = _post(
        server.port, "/reconstruct?stream=1&chunk=3", body)
    assert st_full == 200 and st_stream == 200
    assert ctype == "audio/wav"
    assert stream == full


def test_stream_reconstruct_ola_matches_full(server):
    """The OLA mode stitches raw decoded frame chunks through
    OverlapAddStream — cross-chunk overlap regions must come out
    bit-identical to the one-shot overlap_add."""
    wave, body = _wav_body(SEG * 9, seed=8)
    _, _, full = _post(server.port, "/reconstruct?hop=64&ola=1", body)
    _, _, stream = _post(
        server.port, "/reconstruct?hop=64&ola=1&stream=1&chunk=5", body)
    assert stream == full


def test_stream_content_length_exact(server):
    """The streaming response declares its exact byte count up front (the
    output length is a pure function of the input), so clients can detect
    a mid-stream failure as truncation."""
    wave, body = _wav_body(SEG * 5, seed=9)
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
    conn.request("POST", "/reconstruct?stream=1&chunk=2", body=body)
    resp = conn.getresponse()
    declared = int(resp.getheader("Content-Length"))
    data = resp.read()
    conn.close()
    assert len(data) == declared
    out, sr = _wav_from_bytes(data)
    assert sr == 44100 and out.shape == (SEG * 5,)


def test_warmup_compiles_and_preserves_noise_stream():
    """warmup=True pre-compiles the batched paths without consuming an RNG
    tick: a STOCHASTIC reconstruct must return byte-identical audio from a
    warmed and an unwarmed server (same seed) — the warmup pass uses
    fold_in(key, 0), which no real batch uses."""
    cfg = Config()
    cfg.audio.segment_length = SEG
    cfg.audio.hop_length = 64
    cfg.vae.n_units = 64
    cfg.vae.latent_dim = LATENT
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    wave, body = _wav_body(SEG * 3, seed=11)
    outs = []
    for warm in (False, True):
        with HttpInferenceServer(model, params, sampling_rate=44100,
                                 port=0, batch_size=16,
                                 warmup=warm) as srv:
            status, ctype, data = _post(srv.port, "/reconstruct", body)
            assert status == 200, data
            outs.append(data)
    assert outs[0] == outs[1]


def test_stream_midway_failure_truncates_not_corrupts(server):
    """Once the 200 + Content-Length are on the wire, a mid-stream failure
    must only TRUNCATE the body (client detects the short read) — never
    append a second status line / JSON error that the client would decode
    as audio."""
    real = server.backend.reconstruct_stream

    def broken(wave, **kw):
        n, gen = real(wave, **kw)

        def poisoned():
            yield next(gen)
            raise RuntimeError("chunk lost mid-stream")

        return n, poisoned()

    wave, body = _wav_body(SEG * 6, seed=3)
    server.backend.reconstruct_stream = broken
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=120)
        conn.request("POST", "/reconstruct?stream=1&chunk=2", body=body)
        resp = conn.getresponse()
        assert resp.status == 200
        declared = int(resp.getheader("Content-Length"))
        try:
            data = resp.read()
        except http.client.IncompleteRead as e:
            data = e.partial
        conn.close()
    finally:
        server.backend.reconstruct_stream = real
    assert len(data) < declared          # truncated ...
    assert b"HTTP/1.0" not in data       # ... with no embedded status line
    assert b'{"error"' not in data       # ... and no JSON error payload
