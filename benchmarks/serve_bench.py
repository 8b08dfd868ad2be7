"""End-to-end serving benchmark for the batched inference service.

BASELINE.json config #5 ("inference server: batched encode/interpolate/
decode with overlap-add streaming synthesis") gets its decode-throughput
attestation from ``bench.py --metric synth``; this script attests the FULL
service path instead: HTTP request -> wav decode -> framing -> batched
encode/reparam/decode on device -> overlap-add -> wav encode -> response.
Concurrent clients exercise the request-coalescing worker exactly the way
production traffic would (reference analog: the notebook's one-clip-at-a-
time loop, /root/reference/tutorial.ipynb cells 14-22, which had no
serving story at all).

Run from the repo root on TPU (or CPU -- it auto-reports the platform):

    python benchmarks/serve_bench.py [--clients 16] [--requests 8]
        [--seconds 2.0] [--batch-size 256] [--quantize] [--ola]

Prints one JSON line: unloaded p50 latency, loaded p50/p90/p99, requests/s,
and the aggregate realtime factor (seconds of audio served per wall
second).  Methodology matches docs/PERF.md: a warmup request per kind
fetches a real value before any timing (async-compile tunnel rule).
"""

from __future__ import annotations

import argparse
import http.client
import io
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SR = 44100


def _percentile(xs, q):
    return float(np.percentile(np.asarray(xs, dtype=np.float64), q))


def _post(port: int, path: str, body: bytes, timeout: float = 300.0):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        conn.request("POST", path, body=body)
        resp = conn.getresponse()
        data = resp.read()
        return resp.status, data
    finally:
        conn.close()


def _stream_probe(port: int, path: str, body: bytes,
                  timeout: float = 300.0):
    """POST a streamed reconstruct and time (a) the first PAYLOAD byte —
    the WAV header goes out before any decode, so first-audio is when the
    received byte count passes the ~60-byte header — and (b) the full
    body.  Returns (first_s, total_s, n_bytes)."""
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        t0 = time.perf_counter()
        conn.request("POST", path, body=body)
        resp = conn.getresponse()
        got, t_first = 0, None
        while True:
            piece = resp.read(1 << 16)
            if not piece:
                break
            got += len(piece)
            if t_first is None and got > 128:
                t_first = time.perf_counter() - t0
        return t_first, time.perf_counter() - t0, got
    finally:
        conn.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=8,
                    help="requests per client in the loaded phase")
    ap.add_argument("--seconds", type=float, default=2.0,
                    help="audio seconds per request")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--max-wait-ms", type=float, default=2.0)
    ap.add_argument("--quantize", action="store_true",
                    help="int8 weight-only decode path")
    ap.add_argument("--ola", action="store_true",
                    help="overlap-add resynthesis (hop = seg/2)")
    ap.add_argument("--unloaded-probes", type=int, default=20)
    ap.add_argument("--stream-seconds", type=float, default=30.0,
                    help="long-clip length for the streaming first-chunk "
                         "latency row (0 disables)")
    ap.add_argument("--stream-chunk", type=int, default=256,
                    help="frames per streamed chunk")
    ap.add_argument("--stream-probes", type=int, default=5)
    ap.add_argument("--session-seconds", type=float, default=10.0,
                    help="live-session row: total audio fed through a "
                         "stateful /session (0 disables)")
    ap.add_argument("--session-chunk-ms", type=float, default=250.0,
                    help="live-session row: milliseconds of audio per feed")
    args = ap.parse_args()

    import jax

    from rawaudiovae_kelsey_tpu.config import Config
    from rawaudiovae_kelsey_tpu.infer import HttpInferenceServer
    from rawaudiovae_kelsey_tpu.io.wavio import encode_wav_bytes
    from rawaudiovae_kelsey_tpu.models import build_model

    # Reference-scale dense model (default.ini hyperparameters).
    cfg = Config()
    cfg.audio.segment_length = 1024
    cfg.audio.hop_length = 128
    cfg.vae.n_units = 2048
    cfg.vae.latent_dim = 256
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    platform = jax.devices()[0].platform

    seg = cfg.audio.segment_length
    n = int(args.seconds * SR)
    rng = np.random.default_rng(0)
    t = np.arange(n) / SR
    wave = (0.4 * np.sin(2 * np.pi * 440.0 * t)
            + 0.05 * rng.normal(0, 1, n)).astype(np.float32)
    body = encode_wav_bytes(wave, SR)
    path = "/reconstruct?hop=512&ola=1" if args.ola else "/reconstruct"

    lat_loaded: list = []
    errors: list = []

    with HttpInferenceServer(model, params, sampling_rate=SR, port=0,
                             batch_size=args.batch_size,
                             quantize=args.quantize, warmup=True) as srv:
        srv.backend.max_wait_s = args.max_wait_ms / 1e3
        port = srv.port

        # Warmup request: exercise the HTTP layer end-to-end and fetch real
        # bytes (the jit compiles already ran in the server's warmup —
        # without it, a slow tunnel hour pushed the first reconstruct
        # compile past the 120 s request timeout and this 504'd).
        status, data = _post(port, path, body)
        if status != 200:
            print(json.dumps({"error": f"warmup failed: {status} "
                              f"{data[:200]!r}"}))
            sys.exit(1)

        # Unloaded latency: sequential probes, one request in flight.
        unloaded = []
        for _ in range(args.unloaded_probes):
            t0 = time.perf_counter()
            status, _ = _post(port, path, body)
            unloaded.append(time.perf_counter() - t0)
            if status != 200:
                errors.append(status)

        # Loaded phase: concurrent clients, closed loop.
        barrier = threading.Barrier(args.clients + 1)
        lock = threading.Lock()

        def client():
            mine = []
            barrier.wait()
            for _ in range(args.requests):
                t0 = time.perf_counter()
                status, _ = _post(port, path, body)
                dt = time.perf_counter() - t0
                if status == 200:
                    mine.append(dt)
                else:
                    with lock:
                        errors.append(status)
            with lock:
                lat_loaded.extend(mine)

        threads = [threading.Thread(target=client)
                   for _ in range(args.clients)]
        for th in threads:
            th.start()
        barrier.wait()
        t_start = time.perf_counter()
        for th in threads:
            th.join()
        wall = time.perf_counter() - t_start

        # Streaming first-chunk latency (VERDICT r3 item 6): a LONG clip
        # through /reconstruct?stream=1 — first audio must decouple from
        # clip length (the chunks pipeline through the coalescing queue).
        stream_stats = None
        if args.stream_seconds > 0:
            n_long = int(args.stream_seconds * SR)
            long_wave = (0.4 * np.sin(
                2 * np.pi * 440.0 * np.arange(n_long) / SR)
            ).astype(np.float32)
            long_body = encode_wav_bytes(long_wave, SR)
            sep = "&" if "?" in path else "?"
            spath = f"{path}{sep}stream=1&chunk={args.stream_chunk}"
            firsts, totals = [], []
            nbytes = 0
            for _ in range(max(args.stream_probes, 1)):
                first, total, nbytes = _stream_probe(port, spath, long_body)
                if first is not None:
                    firsts.append(first)
                    totals.append(total)
            # same clip, unstreamed: what the caller would have waited
            t0 = time.perf_counter()
            status, whole = _post(port, path, long_body)
            unstreamed_s = time.perf_counter() - t0
            stream_stats = {
                "clip_seconds": args.stream_seconds,
                "chunk_frames": args.stream_chunk,
                "first_chunk_p50_ms": round(_percentile(firsts, 50) * 1e3, 1),
                "first_chunk_min_ms": round(min(firsts) * 1e3, 1),
                "stream_total_p50_ms": round(_percentile(totals, 50) * 1e3, 1),
                "unstreamed_total_ms": round(unstreamed_s * 1e3, 1),
                "bytes": nbytes,
            } if firsts else {"error": "no stream probe completed"}

        # Live-session row (VERDICT r4 item 4): chunked INPUT audio through
        # the stateful /session endpoints — the live analog of the
        # notebook's interactive loop.  first-audio = wall from the first
        # feed POST to the first response carrying samples; steady
        # ×realtime = audio seconds finalized per wall second across the
        # whole feed loop (each feed is an HTTP round trip + one coalesced
        # device batch).
        session_stats = None
        if args.session_seconds > 0:
            import json as _json

            chunk_n = max(1, int(args.session_chunk_ms / 1e3 * SR))
            n_total = int(args.session_seconds * SR)
            live = (0.4 * np.sin(
                2 * np.pi * 330.0 * np.arange(n_total) / SR)
            ).astype(np.float32)
            spath = "/session/open?hop=512&ola=1" if args.ola \
                else "/session/open"
            status, data = _post(port, spath, b"")
            if status != 200:
                session_stats = {"error": f"open failed: {status}"}
            else:
                from rawaudiovae_kelsey_tpu.io.wavio import decode_wav_bytes

                def _n_samples(wav_bytes: bytes) -> int:
                    samples, _sr = decode_wav_bytes(wav_bytes,
                                                    name="<session>")
                    return int(samples.shape[0])

                sid = _json.loads(data)["session"]
                first_audio_s = None
                out_samples = 0
                t0 = time.perf_counter()
                for i in range(0, n_total, chunk_n):
                    body_c = encode_wav_bytes(live[i:i + chunk_n], SR)
                    status, piece = _post(port, f"/session/{sid}/feed",
                                          body_c)
                    if status != 200:
                        errors.append(status)
                        continue
                    got = _n_samples(piece)
                    out_samples += got
                    if first_audio_s is None and got > 0:
                        first_audio_s = time.perf_counter() - t0
                wall_feed = time.perf_counter() - t0
                status, tail = _post(port, f"/session/{sid}/close", b"")
                if status == 200:
                    out_samples += _n_samples(tail)
                session_stats = {
                    "audio_seconds": args.session_seconds,
                    "chunk_ms": args.session_chunk_ms,
                    "feeds": -(-n_total // chunk_n),
                    "first_audio_ms": (round(first_audio_s * 1e3, 1)
                                       if first_audio_s is not None
                                       else None),
                    "out_seconds": round(out_samples / SR, 2),
                    "x_realtime": round(
                        (out_samples / SR) / wall_feed, 1)
                    if wall_feed > 0 else 0.0,
                }

    n_ok = len(lat_loaded)
    total_audio_s = n_ok * args.seconds
    result = {
        "metric": "serve_realtime_factor",
        "value": round(total_audio_s / wall, 1) if wall > 0 else 0.0,
        "unit": "x_realtime",
        "platform": platform,
        "path": path,
        "clients": args.clients,
        "requests_ok": n_ok,
        "errors": len(errors),
        "audio_seconds_per_request": args.seconds,
        "quantize": bool(args.quantize),
        "batch_size": args.batch_size,
        "requests_per_sec": round(n_ok / wall, 1) if wall > 0 else 0.0,
        "unloaded_p50_ms": round(_percentile(unloaded, 50) * 1e3, 1),
        "loaded_p50_ms": round(_percentile(lat_loaded, 50) * 1e3, 1),
        "loaded_p90_ms": round(_percentile(lat_loaded, 90) * 1e3, 1),
        "loaded_p99_ms": round(_percentile(lat_loaded, 99) * 1e3, 1),
    }
    if stream_stats is not None:
        result["streaming"] = stream_stats
    if session_stats is not None:
        result["live_session"] = session_stats
    print(json.dumps(result))


if __name__ == "__main__":
    main()
