"""Stateful live-session serving (VERDICT r4 item 4): chunked input audio →
streamed output with cross-chunk overlap-add continuity, bit-identical to
the one-shot path on the same audio (deterministic backend), plus the HTTP
session endpoints with their race/capacity/TTL behavior."""

import http.client
import io
import tempfile
import threading
import time
from pathlib import Path

import numpy as np
import pytest

import jax

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.infer import (
    HttpInferenceServer,
    InferenceServer,
    LiveSession,
)
from rawaudiovae_kelsey_tpu.io import read_wav, write_wav
from rawaudiovae_kelsey_tpu.models import build_model

SEG, LATENT, HOP = 256, 16, 64


def _model_params():
    cfg = Config()
    cfg.audio.segment_length = SEG
    cfg.audio.hop_length = HOP
    cfg.vae.n_units = 64
    cfg.vae.latent_dim = LATENT
    model = build_model(cfg)
    return model, model.init(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def backend():
    model, params = _model_params()
    with InferenceServer(model, params, batch_size=16,
                         deterministic=True) as srv:
        yield srv


@pytest.fixture(scope="module")
def http_server():
    model, params = _model_params()
    with HttpInferenceServer(model, params, sampling_rate=44100, port=0,
                             batch_size=16, deterministic=True) as srv:
        yield srv


def _chunks(wave, sizes):
    out, i = [], 0
    for s in sizes:
        out.append(wave[i:i + s])
        i += s
    if i < len(wave):
        out.append(wave[i:])
    return out


def _wave(n, seed=0):
    return np.random.default_rng(seed).uniform(-0.8, 0.8, n).astype(
        np.float32)


# ------------------------------------------------------------- backend ----

def test_session_flat_bit_identical_to_oneshot(backend):
    wave = _wave(SEG * 5 + 77)
    whole = backend.reconstruct(wave).result(60)
    sess = backend.live_session()
    pieces = [sess.feed(c) for c in _chunks(wave, [100, SEG, 3, SEG * 2])]
    pieces.append(sess.close())
    got = np.concatenate(pieces)
    np.testing.assert_array_equal(got, whole)


def test_session_ola_bit_identical_to_oneshot(backend):
    wave = _wave(SEG * 4 + 190, seed=1)
    whole = backend.reconstruct(wave, hop=HOP, ola=True).result(60)
    sess = backend.live_session(hop=HOP, ola=True)
    pieces = [sess.feed(c) for c in _chunks(wave, [SEG + 5, 40, SEG * 2])]
    pieces.append(sess.close())
    got = np.concatenate(pieces)
    np.testing.assert_array_equal(got, whole)


def test_session_chunking_invariance(backend):
    """Deterministic backend: the output must not depend on HOW the input
    was chunked (framing offsets are global, stitching is exact)."""
    wave = _wave(SEG * 3 + 50, seed=2)
    outs = []
    for sizes in ([SEG * 3 + 50], [1] * 10 + [SEG, SEG * 2],
                  [SEG // 2] * 7):
        sess = backend.live_session(hop=HOP, ola=True)
        pieces = [sess.feed(c) for c in _chunks(wave, sizes)]
        pieces.append(sess.close())
        outs.append(np.concatenate(pieces))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_session_short_input_matches_oneshot(backend):
    """Input shorter than one segment: the close() padding must match the
    one-shot path's tail padding exactly."""
    wave = _wave(30, seed=3)
    whole = backend.reconstruct(wave).result(60)
    sess = backend.live_session()
    p1 = sess.feed(wave)
    p2 = sess.close()
    np.testing.assert_array_equal(np.concatenate([p1, p2]), whole)
    # and a completely empty session closes to empty audio
    empty = backend.live_session()
    assert empty.close().size == 0


def test_session_morph_matches_direct_composition(backend):
    """Morph mode == encode both, lerp (mu, logvar) with target frame
    i % len(target), z = mu_mix (deterministic), decode — computed here
    through the public API as the independent oracle."""
    wave = _wave(SEG * 6, seed=4)
    target = _wave(SEG * 2, seed=5)  # shorter than input -> must cycle
    alpha = 0.3

    sess = backend.live_session(target=target, alpha=alpha)
    pieces = [sess.feed(c) for c in _chunks(wave, [SEG * 2 + 9, SEG])]
    pieces.append(sess.close())
    got = np.concatenate(pieces)

    mu, lv = backend.encode(wave).result(60)
    mu_t, lv_t = backend.encode(target).result(60)
    idx = np.arange(len(mu)) % len(mu_t)
    mu_mix = (1.0 - alpha) * mu + alpha * mu_t[idx]
    frames = backend.decode(mu_mix.astype(np.float32)).result(60)
    np.testing.assert_array_equal(got, frames.reshape(-1))


def test_session_morph_target_too_short_raises(backend):
    # hop-mode framing keeps only fully-fitting windows, so a sub-segment
    # target yields ZERO trajectory frames — must be a loud open error
    # (non-overlap framing pads any nonempty target to one frame, which is
    # well-defined and allowed)
    with pytest.raises(ValueError, match="shorter than one segment"):
        backend.live_session(hop=HOP, target=np.zeros(10, np.float32))


def test_session_feed_after_close_raises(backend):
    sess = backend.live_session()
    sess.feed(_wave(SEG))
    sess.close()
    with pytest.raises(RuntimeError, match="closed"):
        sess.feed(_wave(SEG))
    # a second close is a clean no-op (close/close race endpoint behavior)
    assert sess.close().size == 0


def test_session_bad_hop_raises(backend):
    with pytest.raises(ValueError, match="divisor"):
        backend.live_session(hop=100)


def test_session_concurrent_feeds_do_not_corrupt(backend):
    """Concurrent feeds are a client protocol error (order is undefined)
    but must serialize on the session lock: total output length equals
    total input frames and every sample is finite."""
    sess = backend.live_session()
    chunks = [_wave(SEG, seed=10 + i) for i in range(8)]
    outs = []
    lock = threading.Lock()

    def feeder(c):
        piece = sess.feed(c)
        with lock:
            outs.append(piece)

    threads = [threading.Thread(target=feeder, args=(c,)) for c in chunks]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    outs.append(sess.close())
    got = np.concatenate(outs)
    assert got.shape == (SEG * 8,)
    assert np.isfinite(got).all()


def test_session_feed_against_stopped_backend_raises():
    model, params = _model_params()
    srv = InferenceServer(model, params, batch_size=16, deterministic=True)
    srv.start()
    sess = srv.live_session()
    srv.stop()
    with pytest.raises(RuntimeError, match="not started|stopped"):
        sess.feed(_wave(SEG))


# ---------------------------------------------------------------- HTTP ----

def _post(port, path, body=b""):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=body)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def _wav_bytes(wave, sr=44100):
    with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
        write_wav(tmp.name, wave, sr)
        return Path(tmp.name).read_bytes()


def _wav_from_bytes(data):
    with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
        Path(tmp.name).write_bytes(data)
        out, sr = read_wav(tmp.name)
    return (out[:, 0] if out.ndim == 2 else out), sr


def _open_session(port, query="", body=b""):
    import json

    status, _, data = _post(port, f"/session/open{query}", body)
    return status, json.loads(data)


def test_http_session_flow_matches_reconstruct(http_server):
    wave = _wave(SEG * 4 + 33, seed=20)
    _, _, whole = _post(http_server.port, "/reconstruct", _wav_bytes(wave))
    status, info = _open_session(http_server.port)
    assert status == 200 and info["mode"] == "reconstruct"
    sid = info["session"]
    got = []
    for c in _chunks(wave, [300, SEG * 2, 11]):
        s, ctype, data = _post(http_server.port, f"/session/{sid}/feed",
                               _wav_bytes(c))
        assert s == 200 and ctype == "audio/wav"
        piece, sr = _wav_from_bytes(data)
        assert sr == 44100
        got.append(piece)
    s, _, data = _post(http_server.port, f"/session/{sid}/close")
    assert s == 200
    got.append(_wav_from_bytes(data)[0])
    whole_wave, _ = _wav_from_bytes(whole)
    np.testing.assert_array_equal(
        np.concatenate([g for g in got if g.size]), whole_wave)
    # the session is gone after close
    s, _, _ = _post(http_server.port, f"/session/{sid}/feed",
                    _wav_bytes(_wave(SEG)))
    assert s == 404


def test_http_session_ola_flow_matches_reconstruct(http_server):
    wave = _wave(SEG * 3 + 100, seed=21)
    _, _, whole = _post(http_server.port,
                        f"/reconstruct?hop={HOP}&ola=1", _wav_bytes(wave))
    status, info = _open_session(http_server.port, f"?hop={HOP}&ola=1")
    assert status == 200 and info["ola"] is True
    sid = info["session"]
    got = []
    for c in _chunks(wave, [SEG, SEG + 60]):
        s, _, data = _post(http_server.port, f"/session/{sid}/feed",
                           _wav_bytes(c))
        assert s == 200
        got.append(_wav_from_bytes(data)[0])
    s, _, data = _post(http_server.port, f"/session/{sid}/close")
    assert s == 200
    got.append(_wav_from_bytes(data)[0])
    whole_wave, _ = _wav_from_bytes(whole)
    np.testing.assert_array_equal(
        np.concatenate([g for g in got if g.size]), whole_wave)


def test_http_session_morph(http_server):
    target = _wave(SEG * 2, seed=22)
    buf = io.BytesIO()
    np.savez(buf, target=target, sr=44100)
    status, info = _open_session(http_server.port, "?alpha=0.4",
                                 buf.getvalue())
    assert status == 200 and info["mode"] == "morph"
    sid = info["session"]
    s, _, data = _post(http_server.port, f"/session/{sid}/feed",
                       _wav_bytes(_wave(SEG * 2, seed=23)))
    assert s == 200
    piece, _ = _wav_from_bytes(data)
    assert piece.shape == (SEG * 2,) and np.abs(piece).max() > 0
    s, _, _ = _post(http_server.port, f"/session/{sid}/close")
    assert s == 200


def test_http_session_unknown_id_is_404(http_server):
    s, _, _ = _post(http_server.port, "/session/nope/feed",
                    _wav_bytes(_wave(SEG)))
    assert s == 404
    s, _, _ = _post(http_server.port, "/session/nope/close")
    assert s == 404
    s, _, _ = _post(http_server.port, "/session/bogus/op", b"")
    assert s == 404


def test_http_session_sr_mismatch_is_400(http_server):
    status, info = _open_session(http_server.port)
    sid = info["session"]
    s, _, data = _post(http_server.port, f"/session/{sid}/feed",
                       _wav_bytes(_wave(1000), sr=22050))
    assert s == 400 and b"resample client-side" in data
    _post(http_server.port, f"/session/{sid}/close")


def test_http_session_capacity_is_429(http_server):
    reg = http_server.sessions
    old = reg.max_sessions
    opened = []
    try:
        reg.max_sessions = len(reg._d) + 1
        s, info = _open_session(http_server.port)
        assert s == 200
        opened.append(info["session"])
        s, info = _open_session(http_server.port)
        assert s == 429
    finally:
        reg.max_sessions = old
        for sid in opened:
            _post(http_server.port, f"/session/{sid}/close")


def test_http_session_ttl_eviction(http_server):
    reg = http_server.sessions
    old = reg.ttl_s
    try:
        s, info = _open_session(http_server.port)
        sid = info["session"]
        reg.ttl_s = 0.01
        time.sleep(0.05)
        s, _, _ = _post(http_server.port, f"/session/{sid}/feed",
                        _wav_bytes(_wave(SEG)))
        assert s == 404
    finally:
        reg.ttl_s = old


def test_http_session_bad_open_body_is_400(http_server):
    s, _, data = _post(http_server.port, "/session/open", b"not npz")
    assert s == 400
    buf = io.BytesIO()
    np.savez(buf, wrong=np.zeros(4))
    s, _, data = _post(http_server.port, "/session/open", buf.getvalue())
    assert s == 400 and b"target" in data


def test_http_stop_with_open_sessions_is_clean():
    """Server stop with live sessions: no hang, sessions aborted."""
    model, params = _model_params()
    srv = HttpInferenceServer(model, params, sampling_rate=44100, port=0,
                              batch_size=16, deterministic=True)
    srv.start()
    s, info = _open_session(srv.port)
    assert s == 200
    sess = srv.sessions.get(info["session"])
    srv.stop()
    assert sess.closed
    assert srv.sessions.get(info["session"]) is None


def test_registry_reserved_seeds_unique_under_concurrency():
    """Two concurrent /session/open calls must never share a session RNG
    seed (the old read-only `_seq + 1` handed both the same value)."""
    from rawaudiovae_kelsey_tpu.infer.http import _SessionRegistry

    reg = _SessionRegistry()
    seeds = []
    lock = threading.Lock()

    def grab():
        for _ in range(50):
            s = reg.reserve_seed()
            with lock:
                seeds.append(s)

    threads = [threading.Thread(target=grab) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(seeds) == len(set(seeds)) == 400
