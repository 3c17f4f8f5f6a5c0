"""Micro-batching inference server: packing/padding correctness, the
unix-socket protocol round trip, and the serve CLI loop."""

import os
import threading

import numpy as np

import jax
import jax.numpy as jnp

from fastdepth_tpu.config import ModelConfig
from fastdepth_tpu.engine.server import (
    InferenceServer,
    request,
    serve_unix_socket,
)
from fastdepth_tpu.models import build

TINY_ENC = (4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24)
TINY_DEC = (18, 14, 10, 6, 4)
CFG = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
HW = 64


def _model_and_params():
    model = build(CFG)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_server_matches_direct_forward(rng):
    """Concurrent single-frame submits == the folded batch forward,
    regardless of how requests were packed into device batches."""
    model, params = _model_and_params()
    frames = [rng.rand(HW, HW, 3).astype(np.float32) for _ in range(5)]
    ref = np.asarray(model.apply(model.fold(params), jnp.asarray(np.stack(frames))))
    with InferenceServer(model, params, batch_size=4, image_size=(HW, HW)) as srv:
        futs = [srv.submit(f) for f in frames]
        preds = [f.result(timeout=60) for f in futs]
    for i, p in enumerate(preds):
        assert p.shape == (HW, HW, 1)
        np.testing.assert_allclose(p, ref[i], atol=1e-5)


def test_server_pads_lone_request(rng):
    """One request rides a zero-padded batch and still matches."""
    model, params = _model_and_params()
    frame = rng.rand(HW, HW, 3).astype(np.float32)
    ref = np.asarray(model.apply(model.fold(params), jnp.asarray(frame[None])))[0]
    with InferenceServer(model, params, batch_size=4, image_size=(HW, HW)) as srv:
        np.testing.assert_allclose(srv(frame), ref, atol=1e-5)


def test_server_rejects_wrong_shape():
    import pytest

    model, params = _model_and_params()
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW)) as srv:
        with pytest.raises(ValueError, match="HWC"):
            srv.submit(np.zeros((HW, HW), np.float32))


def test_unix_socket_round_trip(rng, tmp_path):
    """Full client/server protocol: length-prefixed npy frames over a
    unix socket, many requests per connection."""
    model, params = _model_and_params()
    sock = str(tmp_path / "fd.sock")
    stop = threading.Event()
    ready = threading.Event()
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW)) as srv:
        t = threading.Thread(
            target=serve_unix_socket,
            args=(srv, sock),
            kwargs={"ready": ready, "stop": stop, "log": lambda *a: None},
            daemon=True,
        )
        t.start()
        assert ready.wait(timeout=10)
        frames = [rng.rand(HW, HW, 3).astype(np.float32) for _ in range(3)]
        ref = np.asarray(model.apply(model.fold(params), jnp.asarray(np.stack(frames))))
        for i, f in enumerate(frames):
            np.testing.assert_allclose(request(sock, f), ref[i], atol=1e-5)
        stop.set()
        t.join(timeout=5)
    assert not os.path.exists(sock)


def test_parse_address():
    from fastdepth_tpu.engine.server import parse_address

    assert parse_address("/tmp/fd.sock") == ("unix", "/tmp/fd.sock")
    assert parse_address("relative.sock") == ("unix", "relative.sock")
    assert parse_address("127.0.0.1:7000") == ("tcp", "127.0.0.1", 7000)
    assert parse_address("0.0.0.0:80") == ("tcp", "0.0.0.0", 80)
    assert parse_address("[::1]:7000") == ("tcp", "::1", 7000)
    # a path with a colon stays a unix path; a non-numeric port too
    assert parse_address("/tmp/a:b.sock") == ("unix", "/tmp/a:b.sock")
    assert parse_address("host:abc") == ("unix", "host:abc")
    # a BARE IPv6 address must not split inside itself ('::' port 1):
    # un-bracketed hosts containing ':' are never host:port specs
    assert parse_address("::1") == ("unix", "::1")
    assert parse_address("fe80::2:7000") == ("unix", "fe80::2:7000")


def test_tcp_round_trip_and_stream(rng):
    """Same protocol over TCP (serve_tcp, ephemeral port): single
    round trips AND the pipelined stream client, matching the folded
    forward."""
    from fastdepth_tpu.engine.server import request_stream, serve_tcp

    model, params = _model_and_params()
    stop = threading.Event()
    ready = threading.Event()
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW)) as srv:
        t = threading.Thread(
            target=serve_tcp, args=(srv, "127.0.0.1", 0),
            kwargs={"ready": ready, "stop": stop, "log": lambda *a: None},
            daemon=True,
        )
        t.start()
        assert ready.wait(timeout=10)
        spec = "%s:%d" % srv.bound_address
        frames = [rng.rand(HW, HW, 3).astype(np.float32) for _ in range(4)]
        ref = np.asarray(model.apply(model.fold(params), jnp.asarray(np.stack(frames))))
        np.testing.assert_allclose(request(spec, frames[0]), ref[0], atol=1e-5)
        for i, p in enumerate(request_stream(spec, frames, depth=4)):
            np.testing.assert_allclose(p, ref[i], atol=1e-5)
        stop.set()
        t.join(timeout=5)


def test_tcp_ipv6_round_trip(rng):
    """serve_tcp resolves the address family from the host (getaddrinfo,
    not hard-coded AF_INET) — [::1]:port round-trips."""
    import pytest

    from fastdepth_tpu.engine.server import serve_tcp

    model, params = _model_and_params()
    stop = threading.Event()
    ready = threading.Event()
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW)) as srv:
        t = threading.Thread(
            target=serve_tcp, args=(srv, "::1", 0),
            kwargs={"ready": ready, "stop": stop, "log": lambda *a: None},
            daemon=True,
        )
        t.start()
        if not ready.wait(timeout=10):
            pytest.skip("IPv6 loopback unavailable on this host")
        frame = rng.rand(HW, HW, 3).astype(np.float32)
        ref = np.asarray(model.apply(model.fold(params), jnp.asarray(frame[None])))[0]
        np.testing.assert_allclose(
            request("[::1]:%d" % srv.bound_address[1], frame), ref, atol=1e-5)
        stop.set()
        t.join(timeout=5)


def test_serve_cli_refusal_leaves_live_socket_intact(rng, tmp_path):
    """A second serve CLI refused at startup (live daemon owns the unix
    socket) must NOT unlink the live daemon's socket file on its way
    out — the review found the CLI's old finally block doing exactly
    that, silently unreachable-ing the running daemon."""
    import pytest

    from fastdepth_tpu.engine.server import serve_unix_socket

    model, params = _model_and_params()
    sock = str(tmp_path / "fd.sock")
    stop = threading.Event()
    ready = threading.Event()
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW)) as srv:
        t = threading.Thread(
            target=serve_unix_socket, args=(srv, sock),
            kwargs={"ready": ready, "stop": stop, "log": lambda *a: None},
            daemon=True,
        )
        t.start()
        assert ready.wait(timeout=10)
        # second daemon on the same socket: engine layer refuses...
        with pytest.raises(RuntimeError, match="live server"):
            serve_unix_socket(srv, sock, log=lambda *a: None)
        # ...and the live daemon's socket file must still exist and serve
        assert os.path.exists(sock)
        frame = rng.rand(HW, HW, 3).astype(np.float32)
        assert request(sock, frame).shape == (HW, HW, 1)
        stop.set()
        t.join(timeout=5)


def test_serve_cli_ping(rng, tmp_path, capsys):
    """The CLI's client mode against a live server (CHW input accepted,
    NCHW prediction saved like the reference deploy runner)."""
    from fastdepth_tpu.cli import serve as serve_cli

    model, params = _model_and_params()
    sock = str(tmp_path / "fd.sock")
    stop = threading.Event()
    ready = threading.Event()
    frame = rng.rand(HW, HW, 3).astype(np.float32)
    rgb_path = str(tmp_path / "rgb.npy")
    np.save(rgb_path, np.transpose(frame, (2, 0, 1)))  # CHW like deploy data
    out_path = str(tmp_path / "pred.npy")
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW)) as srv:
        t = threading.Thread(
            target=serve_unix_socket,
            args=(srv, sock),
            kwargs={"ready": ready, "stop": stop, "log": lambda *a: None},
            daemon=True,
        )
        t.start()
        assert ready.wait(timeout=10)
        rc = serve_cli.main(["--socket", sock, "--ping", rgb_path,
                             "--ping-out", out_path])
        stop.set()
        t.join(timeout=5)
    assert rc == 0
    assert "pred shape=(64, 64, 1)" in capsys.readouterr().out
    ref = np.asarray(model.apply(model.fold(params), jnp.asarray(frame[None])))
    saved = np.load(out_path)
    assert saved.shape == (1, 1, HW, HW)
    np.testing.assert_allclose(saved[0, 0], ref[0, :, :, 0], atol=1e-5)


def test_serve_cli_stream_ping(rng, tmp_path, capsys):
    """--ping --stream N drives the pipelined client through the CLI."""
    from fastdepth_tpu.cli import serve as serve_cli

    model, params = _model_and_params()
    frame = rng.rand(HW, HW, 3).astype(np.float32)
    rgb_path = str(tmp_path / "rgb.npy")
    np.save(rgb_path, frame)
    with InferenceServer(model, params, batch_size=4, image_size=(HW, HW)) as srv:
        sock, stop, t = _live_socket(tmp_path, srv)
        rc = serve_cli.main(["--socket", sock, "--ping", rgb_path,
                             "--stream", "9", "--stream-depth", "8"])
        stop.set()
        t.join(timeout=5)
    assert rc == 0
    out = capsys.readouterr().out
    assert "streamed 9 frames" in out
    assert srv.stats()["frames"] == 9


def test_serve_cli_stats_client(rng, tmp_path, capsys):
    """'cli.serve --stats' fetches the live health/stats JSON over the
    wire op (VERDICT r3 item 7)."""
    import json

    from fastdepth_tpu.cli import serve as serve_cli

    model, params = _model_and_params()
    frame = rng.rand(HW, HW, 3).astype(np.float32)
    with InferenceServer(model, params, batch_size=4, image_size=(HW, HW)) as srv:
        sock, stop, t = _live_socket(tmp_path, srv)
        srv(frame)  # one served frame so latency_ms exists
        rc = serve_cli.main(["--socket", sock, "--stats"])
        stop.set()
        t.join(timeout=5)
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["status"] == "ok" and stats["frames"] == 1
    assert stats["latency_ms"]["count"] == 1


def test_serve_cli_daemon_launch_spatial_mesh(rng, tmp_path):
    """The CLI's daemon-launch path end to end: load an .npz checkpoint,
    build a (data=2, space=4) mesh from --mesh-devices/--mesh-spatial,
    serve over the unix socket, and answer a client ping with the
    single-device prediction."""
    from fastdepth_tpu.checkpoint.io import jax_to_numpy, save_checkpoint
    from fastdepth_tpu.cli import serve as serve_cli
    from fastdepth_tpu.engine.server import request

    model, params = _model_and_params()
    ckpt = str(tmp_path / "tiny.npz")
    save_checkpoint(ckpt, jax_to_numpy(params), CFG)
    sock = str(tmp_path / "fd.sock")
    ready, stop = threading.Event(), threading.Event()
    rc = {}
    t = threading.Thread(
        target=lambda: rc.setdefault("rc", serve_cli.main(
            ["--evaluate", ckpt, "--socket", sock, "--batch-size", "2",
             "--image-size", str(HW), str(HW), "--stats-every", "0",
             "--mesh-devices", "2", "--mesh-spatial", "4"],
            _ready=ready, _stop=stop)),
        daemon=True)
    t.start()
    assert ready.wait(timeout=120), "daemon never came up"
    frame = rng.rand(HW, HW, 3).astype(np.float32)
    pred = request(sock, frame)
    stop.set()
    t.join(timeout=30)
    assert rc.get("rc") == 0
    ref = np.asarray(model.apply(model.fold(params), jnp.asarray(frame[None])))
    np.testing.assert_allclose(pred, ref[0], atol=1e-5)


def test_serve_cli_daemon_launch_tcp(rng, tmp_path):
    """The CLI's TCP dispatch end to end: --socket 127.0.0.1:PORT routes
    through serve_tcp and answers a client ping."""
    import socket as _socket

    from fastdepth_tpu.checkpoint.io import jax_to_numpy, save_checkpoint
    from fastdepth_tpu.cli import serve as serve_cli

    model, params = _model_and_params()
    ckpt = str(tmp_path / "tiny.npz")
    save_checkpoint(ckpt, jax_to_numpy(params), CFG)
    # grab a free loopback port (closed before the daemon binds it;
    # single-process test, so the race window is theoretical)
    probe = _socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    spec = f"127.0.0.1:{port}"
    ready, stop = threading.Event(), threading.Event()
    rc = {}
    t = threading.Thread(
        target=lambda: rc.setdefault("rc", serve_cli.main(
            ["--evaluate", ckpt, "--socket", spec, "--batch-size", "2",
             "--image-size", str(HW), str(HW), "--stats-every", "0"],
            _ready=ready, _stop=stop)),
        daemon=True)
    t.start()
    assert ready.wait(timeout=120), "daemon never came up"
    frame = rng.rand(HW, HW, 3).astype(np.float32)
    pred = request(spec, frame)
    stop.set()
    t.join(timeout=30)
    assert rc.get("rc") == 0
    ref = np.asarray(model.apply(model.fold(params), jnp.asarray(frame[None])))
    np.testing.assert_allclose(pred, ref[0], atol=1e-5)


def test_stream_half_close_survives_slow_first_result(rng, tmp_path, monkeypatch):
    """Cold-compile regime: a pipelined client half-closes after its last
    frame while the first result is still pending.  The handler's drain
    must wait on device work indefinitely (only a send with zero
    progress means a dead peer) — with the no-progress timeout shrunk
    below the result delay, every answer must still arrive."""
    import time
    from concurrent.futures import Future

    from fastdepth_tpu.engine import server as srv_mod
    from fastdepth_tpu.engine.server import request_stream

    monkeypatch.setattr(srv_mod, "DRAIN_NO_PROGRESS_TIMEOUT", 0.2)
    model, params = _model_and_params()
    with InferenceServer(model, params, batch_size=2,
                         image_size=(HW, HW)) as srv:
        real_submit = srv.submit

        def slow_submit(frame):
            inner = real_submit(frame)
            outer: Future = Future()

            def chain():
                time.sleep(1.0)  # >> the shrunk no-progress timeout
                try:
                    outer.set_result(inner.result(timeout=60))
                except Exception as e:  # pragma: no cover
                    outer.set_exception(e)

            threading.Thread(target=chain, daemon=True).start()
            return outer

        srv.submit = slow_submit
        sock, stop, t = _live_socket(tmp_path, srv)
        frames = [rng.rand(HW, HW, 3).astype(np.float32) for _ in range(3)]
        preds = list(request_stream(sock, frames, depth=4))
        stop.set()
        t.join(timeout=10)
    assert len(preds) == 3
    ref = np.asarray(model.apply(model.fold(params), jnp.asarray(np.stack(frames))))
    for i, p in enumerate(preds):
        np.testing.assert_allclose(p, ref[i], atol=1e-5)


def test_server_uint8_device_normalize(rng):
    """uint8 ingestion == float path on the same /255'd frames (the
    Evaluator's --device-normalize math, 4x less transfer)."""
    import pytest

    model, params = _model_and_params()
    raw = (rng.rand(HW, HW, 3) * 255).astype(np.uint8)
    ref = np.asarray(model.apply(
        model.fold(params), jnp.asarray(raw[None].astype(np.float32) / 255.0)))[0]
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW),
                         input_dtype=np.uint8) as srv:
        np.testing.assert_allclose(srv(raw), ref, atol=1e-5)
        with pytest.raises(ValueError, match="input_dtype"):
            srv.submit(raw.astype(np.float32))


def test_server_pipelined_burst(rng):
    """A deep burst (many batches in flight) resolves every future
    correctly with the pipelined drainer."""
    model, params = _model_and_params()
    frames = [rng.rand(HW, HW, 3).astype(np.float32) for _ in range(33)]
    ref = np.asarray(model.apply(model.fold(params), jnp.asarray(np.stack(frames))))
    with InferenceServer(model, params, batch_size=8, image_size=(HW, HW),
                         pipeline_depth=3) as srv:
        futs = [srv.submit(f) for f in frames]
        for i, f in enumerate(futs):
            np.testing.assert_allclose(f.result(timeout=120), ref[i], atol=1e-5)


def test_server_stats_counters(rng):
    model, params = _model_and_params()
    with InferenceServer(model, params, batch_size=4, image_size=(HW, HW)) as srv:
        futs = [srv.submit(rng.rand(HW, HW, 3).astype(np.float32))
                for _ in range(6)]
        for f in futs:
            f.result(timeout=60)
        s = srv.stats()
    assert s["frames"] == 6
    assert s["batches"] >= 2  # 6 frames through batch-4 packing
    assert 0 < s["mean_occupancy"] <= 1.0


def test_server_chain_mode_matches_direct_forward(rng):
    """Device-resident frame chaining (VERDICT r3 item 6): the window
    executes as in-graph sequential batch-1 forwards — results must
    equal the straight forward, padding and packing included."""
    model, params = _model_and_params()
    frames = [rng.rand(HW, HW, 3).astype(np.float32) for _ in range(5)]
    ref = np.asarray(model.apply(model.fold(params), jnp.asarray(np.stack(frames))))
    with InferenceServer(model, params, batch_size=4, image_size=(HW, HW),
                         chain=True) as srv:
        futs = [srv.submit(f) for f in frames]
        preds = [f.result(timeout=120) for f in futs]
        assert srv.stats()["chain"] is True
    for i, p in enumerate(preds):
        np.testing.assert_allclose(p, ref[i], atol=1e-5)


def test_server_chain_rejects_data_mesh():
    import pytest

    from fastdepth_tpu.parallel.mesh import make_mesh

    model, params = _model_and_params()
    with pytest.raises(ValueError, match="chain"):
        InferenceServer(model, params, batch_size=4, image_size=(HW, HW),
                        chain=True, mesh=make_mesh(2))


def test_server_latency_distribution(rng):
    """stats()['latency_ms'] tracks submit->resolved per request
    (VERDICT r3 item 7): count matches, p50 <= p99 <= max, all
    positive."""
    model, params = _model_and_params()
    with InferenceServer(model, params, batch_size=4, image_size=(HW, HW)) as srv:
        futs = [srv.submit(rng.rand(HW, HW, 3).astype(np.float32))
                for _ in range(9)]
        for f in futs:
            f.result(timeout=60)
        s = srv.stats()
    lat = s["latency_ms"]
    assert lat["count"] == 9
    assert 0 < lat["p50"] <= lat["p99"] <= lat["max"]
    assert s["status"] == "ok" and s["uptime_s"] >= 0


def test_socket_stats_op(rng, tmp_path):
    """The wire protocol's zero-length health/stats op: a client gets the
    live stats JSON (incl. latency percentiles) mid-stream, in request
    order, without disturbing predictions (VERDICT r3 item 7)."""
    import json
    import threading

    from fastdepth_tpu.engine.server import request_stats

    model, params = _model_and_params()
    sock = str(tmp_path / "fd.sock")
    stop = threading.Event()
    ready = threading.Event()
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW)) as srv:
        t = threading.Thread(
            target=serve_unix_socket, args=(srv, sock),
            kwargs={"ready": ready, "stop": stop, "log": lambda *a: None},
            daemon=True)
        t.start()
        assert ready.wait(timeout=10)
        # health probe works before any prediction (no latency block yet)
        s0 = request_stats(sock)
        assert s0["status"] == "ok" and s0["frames"] == 0
        assert "latency_ms" not in s0
        frame = rng.rand(HW, HW, 3).astype(np.float32)
        ref = np.asarray(model.apply(model.fold(params), jnp.asarray(frame[None])))[0]
        np.testing.assert_allclose(request(sock, frame), ref, atol=1e-5)
        s1 = request_stats(sock)
        assert s1["frames"] == 1
        assert s1["latency_ms"]["count"] == 1
        assert s1["latency_ms"]["p99"] > 0
        json.dumps(s1)  # the whole payload stays JSON-round-trippable
        stop.set()
        t.join(timeout=5)


def test_server_float16_output(rng):
    """output_dtype=float16 halves the payload; values match fp32 within
    f16 precision."""
    model, params = _model_and_params()
    frame = rng.rand(HW, HW, 3).astype(np.float32)
    ref = np.asarray(model.apply(model.fold(params), jnp.asarray(frame[None])))[0]
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW),
                         output_dtype=np.float16) as srv:
        pred = srv(frame)
    assert pred.dtype == np.float16
    np.testing.assert_allclose(pred.astype(np.float32), ref, atol=2e-3)


def test_server_survives_cancelled_futures(rng):
    """A future cancelled before resolution must not kill the drainer
    (set_running_or_notify_cancel claims it atomically)."""
    model, params = _model_and_params()
    frames = [rng.rand(HW, HW, 3).astype(np.float32) for _ in range(4)]
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW)) as srv:
        futs = [srv.submit(f) for f in frames]
        futs[1].cancel()  # may or may not land before the drainer claims it
        done = [f.result(timeout=60) for f in futs if not f.cancelled()]
        assert len(done) in (3, 4)
        # the drainer is still alive and serving
        assert srv(frames[0]).shape == (HW, HW, 1)


def test_server_submit_after_close_raises():
    import pytest

    model, params = _model_and_params()
    srv = InferenceServer(model, params, batch_size=2, image_size=(HW, HW))
    srv.close()
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(np.zeros((HW, HW, 3), np.float32))


def test_server_result_owns_its_buffer(rng):
    """Predictions must be copies, not views pinning the whole batch."""
    model, params = _model_and_params()
    with InferenceServer(model, params, batch_size=4, image_size=(HW, HW)) as srv:
        pred = srv(rng.rand(HW, HW, 3).astype(np.float32))
    assert pred.base is None


def test_socket_refuses_live_hijack(rng, tmp_path):
    """A second daemon must refuse a socket path a live server owns."""
    import pytest

    model, params = _model_and_params()
    sock = str(tmp_path / "fd.sock")
    stop = threading.Event()
    ready = threading.Event()
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW)) as srv:
        t = threading.Thread(
            target=serve_unix_socket, args=(srv, sock),
            kwargs={"ready": ready, "stop": stop, "log": lambda *a: None},
            daemon=True)
        t.start()
        assert ready.wait(timeout=10)
        with pytest.raises(RuntimeError, match="live server"):
            serve_unix_socket(srv, sock, log=lambda *a: None)
        stop.set()
        t.join(timeout=5)


def _conn_dropped(c) -> bool:
    """True iff the server ended this connection (EOF or reset)."""
    try:
        return c.recv(1) == b""
    except ConnectionResetError:
        return True


def _live_socket(tmp_path, srv):
    """Start serve_unix_socket on a thread; returns (sock_path, stop, t)."""
    sock = str(tmp_path / "fd.sock")
    stop = threading.Event()
    ready = threading.Event()
    t = threading.Thread(
        target=serve_unix_socket, args=(srv, sock),
        kwargs={"ready": ready, "stop": stop, "log": lambda *a: None},
        daemon=True)
    t.start()
    assert ready.wait(timeout=10)
    return sock, stop, t


def test_socket_rejects_oversized_length_header(rng, tmp_path):
    """A hostile 4-byte header claiming a multi-GB payload must get the
    connection dropped (bounded by MAX_PAYLOAD), not pin a handler thread
    forever — and the daemon keeps serving well-formed clients."""
    import socket as socketlib

    model, params = _model_and_params()
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW)) as srv:
        sock, stop, t = _live_socket(tmp_path, srv)
        c = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
        c.connect(sock)
        c.settimeout(10)
        c.sendall((0xFFFFFFFF).to_bytes(4, "big") + b"\x93NUMPY junk")
        # server must drop the connection: clean EOF, or RST if our
        # unread bytes were still in flight when it closed
        assert _conn_dropped(c)
        c.close()
        # ...and stay alive for the next client
        frame = rng.rand(HW, HW, 3).astype(np.float32)
        assert request(sock, frame).shape == (HW, HW, 1)
        stop.set()
        t.join(timeout=5)


def test_socket_rejects_garbage_payload(rng, tmp_path):
    """A well-framed but non-npy body (or a pickle bomb) is refused via
    ProtocolError — np.load runs with allow_pickle=False — and the daemon
    survives."""
    import io
    import pickle
    import socket as socketlib

    model, params = _model_and_params()
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW)) as srv:
        sock, stop, t = _live_socket(tmp_path, srv)
        for body in (
            b"this is not an npy payload at all",
            # object-array npy: np.save of a pickled payload
            (lambda b: (np.save(b, np.array([{"x": 1}], dtype=object),
                                allow_pickle=True), b.getvalue())[1])(io.BytesIO()),
            pickle.dumps({"boom": 1}),
        ):
            c = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
            c.connect(sock)
            c.settimeout(10)
            c.sendall(len(body).to_bytes(4, "big") + body)
            assert _conn_dropped(c)
            c.close()
        frame = rng.rand(HW, HW, 3).astype(np.float32)
        assert request(sock, frame).shape == (HW, HW, 1)
        stop.set()
        t.join(timeout=5)


def test_socket_survives_client_disconnects(rng, tmp_path):
    """Torn streams in both directions: a client that dies mid-request
    (truncated body) and one that dies before reading its response leave
    the daemon healthy; concurrent well-behaved clients are unaffected."""
    import io
    import socket as socketlib

    model, params = _model_and_params()
    frame = rng.rand(HW, HW, 3).astype(np.float32)
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW)) as srv:
        sock, stop, t = _live_socket(tmp_path, srv)
        # (a) die mid-request: declare 10 KB, send 100 bytes, vanish
        c = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
        c.connect(sock)
        c.sendall((10240).to_bytes(4, "big") + b"\x00" * 100)
        c.close()
        # (b) die mid-response: send a full valid request, never read,
        # close immediately (sendall on the server side hits EPIPE or a
        # dead buffer; either way only that connection dies)
        buf = io.BytesIO()
        np.save(buf, frame)
        payload = buf.getvalue()
        for _ in range(3):
            c = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
            c.connect(sock)
            c.sendall(len(payload).to_bytes(4, "big") + payload)
            c.shutdown(socketlib.SHUT_RDWR)
            c.close()
        # healthy client still gets correct service
        ref = np.asarray(model.apply(model.fold(params), jnp.asarray(frame[None])))[0]
        np.testing.assert_allclose(request(sock, frame), ref, atol=1e-5)
        stop.set()
        t.join(timeout=5)


def test_socket_pipelined_stream(rng, tmp_path):
    """request_stream keeps many requests in flight on ONE connection and
    receives every prediction in order — a single client can fill the
    compiled device batch (mean_occupancy rises above one-at-a-time)."""
    from fastdepth_tpu.engine.server import request_stream

    model, params = _model_and_params()
    frames = [rng.rand(HW, HW, 3).astype(np.float32) for _ in range(21)]
    ref = np.asarray(model.apply(model.fold(params), jnp.asarray(np.stack(frames))))
    with InferenceServer(model, params, batch_size=4, image_size=(HW, HW)) as srv:
        sock, stop, t = _live_socket(tmp_path, srv)
        preds = list(request_stream(sock, frames, depth=16))
        assert len(preds) == 21
        for i, p in enumerate(preds):
            np.testing.assert_allclose(p, ref[i], atol=1e-5, err_msg=str(i))
        stats = srv.stats()
        assert stats["frames"] == 21
        # with 16 in flight against batch 4, packing must beat 1/batch
        assert stats["mean_occupancy"] > 0.3, stats
        stop.set()
        t.join(timeout=5)


def test_socket_stream_survives_bad_middle_frame(rng, tmp_path):
    """A wrong-shape frame mid-stream kills only that connection (after
    in-flight answers drain); a fresh stream still works."""
    import pytest

    from fastdepth_tpu.engine.server import request_stream

    model, params = _model_and_params()
    good = [rng.rand(HW, HW, 3).astype(np.float32) for _ in range(3)]
    bad_mix = [good[0], rng.rand(8, 8, 3).astype(np.float32), good[1]]
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW)) as srv:
        sock, stop, t = _live_socket(tmp_path, srv)
        with pytest.raises((ConnectionError, BrokenPipeError, OSError)):
            # the server rejects the 8x8 frame and closes; fewer answers
            # than sends -> the client reports the torn stream
            list(request_stream(sock, bad_mix, depth=4))
        preds = list(request_stream(sock, good, depth=4))
        assert len(preds) == 3
        stop.set()
        t.join(timeout=5)


def test_request_stream_no_hang_on_server_eof(rng, tmp_path):
    """A server that answers a couple of frames then closes cleanly must
    make request_stream raise promptly — with frames >> depth the sender
    sits in the window-acquire, and without the dead-flag it would block
    the final join forever (review finding)."""
    import socket as socketlib
    import time

    import pytest

    from fastdepth_tpu.engine.server import _recv_npy, _send_npy, request_stream

    sock_path = str(tmp_path / "eof.sock")
    srv = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
    srv.bind(sock_path)
    srv.listen(1)

    def fake_server():
        conn, _ = srv.accept()
        with conn:
            for _ in range(2):
                arr = _recv_npy(conn)
                _send_npy(conn, arr[..., :1])
        srv.close()

    threading.Thread(target=fake_server, daemon=True).start()
    frames = [rng.rand(4, 4, 3).astype(np.float32) for _ in range(40)]
    t0 = time.time()
    with pytest.raises((ConnectionError, BrokenPipeError, OSError)):
        list(request_stream(sock_path, frames, depth=4))
    assert time.time() - t0 < 20  # no indefinite hang


def test_server_mesh_sharded_matches_single_device(rng):
    """A mesh-backed server (batch sharded over the 8-device CPU mesh)
    returns the same predictions as the single-device server."""
    import pytest

    from fastdepth_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    model, params = _model_and_params()
    frames = [rng.rand(HW, HW, 3).astype(np.float32) for _ in range(5)]
    ref = np.asarray(model.apply(model.fold(params), jnp.asarray(np.stack(frames))))
    mesh = make_mesh(8)
    with InferenceServer(model, params, batch_size=8, image_size=(HW, HW),
                         mesh=mesh) as srv:
        futs = [srv.submit(f) for f in frames]
        for i, f in enumerate(futs):
            np.testing.assert_allclose(f.result(timeout=120), ref[i], atol=1e-5)
    with pytest.raises(ValueError, match="divide"):
        InferenceServer(model, params, batch_size=6, image_size=(HW, HW),
                        mesh=mesh)


def test_server_mesh_spatial_matches_single_device(rng):
    """Serving over a 2-D (data, space) mesh — batch AND image height
    sharded — matches single-device predictions, and the divisibility
    guards check the right axis sizes (batch vs 'data', height vs
    'space'), not the total device count."""
    import pytest

    from fastdepth_tpu.parallel import make_mesh_2d

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    model, params = _model_and_params()
    frames = [rng.rand(HW, HW, 3).astype(np.float32) for _ in range(5)]
    ref = np.asarray(model.apply(model.fold(params), jnp.asarray(np.stack(frames))))
    mesh = make_mesh_2d(2, 4)
    # batch 2 is NOT divisible by the 8-device total; it only needs to
    # divide the 2-way 'data' axis
    with InferenceServer(model, params, batch_size=2, image_size=(HW, HW),
                         mesh=mesh) as srv:
        futs = [srv.submit(f) for f in frames]
        for i, f in enumerate(futs):
            np.testing.assert_allclose(f.result(timeout=120), ref[i], atol=1e-5)
    with pytest.raises(ValueError, match="data"):
        InferenceServer(model, params, batch_size=3, image_size=(HW, HW),
                        mesh=mesh)
    with pytest.raises(ValueError, match="space"):
        InferenceServer(model, params, batch_size=2, image_size=(HW + 2, HW),
                        mesh=mesh)


def test_resolve_future_idempotent():
    """_resolve_future must survive a second resolver (the submit-vs-close
    race resolves the same future from both sides by design): the first
    resolution sticks, the loser is a no-op, nothing raises."""
    from concurrent.futures import Future

    from fastdepth_tpu.engine.server import _resolve_future

    f = Future()
    _resolve_future(f, value=1)
    _resolve_future(f, exc=RuntimeError("late loser"))  # must not raise
    assert f.result(timeout=1) == 1

    f2 = Future()
    f2.cancel()
    _resolve_future(f2, value=2)  # cancelled future: silent no-op
    assert f2.cancelled()


def test_submit_vs_close_race_never_leaves_future_unresolved(rng):
    """If close() lands between submit()'s closed-check and its queue put,
    the drain may already be past the item — the future must still resolve
    (with a result or a 'server is closed' error), never hang."""
    from concurrent.futures import wait

    model, params = _model_and_params()
    srv = InferenceServer(model, params, batch_size=2, image_size=(HW, HW))
    frame = rng.rand(HW, HW, 3).astype(np.float32)

    orig_put = srv._q.put

    def racing_put(item, *a, **kw):
        srv._stop.set()  # simulate close() winning the race post-check
        orig_put(item, *a, **kw)

    srv._q.put = racing_put
    fut = srv.submit(frame)
    srv._q.put = orig_put
    done, _ = wait([fut], timeout=10)
    assert fut in done, "future left unresolved by the submit/close race"
    if fut.exception() is not None:
        assert "closed" in str(fut.exception())
    srv.close()


def test_close_does_not_deadlock_on_full_queue(rng):
    """close() on a server whose queue is FULL: the drainer exits on the
    stop flag without consuming a sentinel, so a blocking put(None)
    would deadlock close() (and every submitter parked behind it)."""
    model, params = _model_and_params()
    srv = InferenceServer(model, params, batch_size=2, image_size=(HW, HW),
                          max_queue=4)
    # wedge the drainer so the queue genuinely fills
    srv._stop.set()
    srv._thread.join(timeout=10)
    assert not srv._thread.is_alive()
    srv._stop.clear()
    futs = []
    frame = rng.rand(HW, HW, 3).astype(np.float32)
    for _ in range(4):  # == max_queue
        from concurrent.futures import Future

        fut = Future()
        srv._q.put((frame, fut, 0.0))
        futs.append(fut)
    t = threading.Thread(target=srv.close, daemon=True)
    t.start()
    t.join(timeout=10)
    assert not t.is_alive(), "close() deadlocked on a full queue"
    for fut in futs:  # the post-join drain must resolve every orphan
        assert fut.done() and "closed" in str(fut.exception())


def test_submit_copies_caller_buffer(rng):
    """A client streaming from one reusable buffer: the queued frame must
    be the server's own copy, or request k is silently answered with
    frame k+1's pixels once the client overwrites the buffer."""
    model, params = _model_and_params()
    srv = InferenceServer(model, params, batch_size=2, image_size=(HW, HW))
    # park the drainer so the queue entry is observable deterministically
    srv._stop.set()
    srv._thread.join(timeout=10)
    srv._stop.clear()
    buf = rng.rand(HW, HW, 3).astype(np.float32)
    srv.submit(buf)
    queued, _, _ = srv._q.get_nowait()
    assert queued is not buf and not np.shares_memory(queued, buf)
    np.testing.assert_array_equal(queued, buf)
    # perf opt-out for in-process clients that never mutate their frames
    srv2 = InferenceServer(model, params, batch_size=2, image_size=(HW, HW),
                           copy_inputs=False)
    srv2._stop.set()
    srv2._thread.join(timeout=10)
    srv2._stop.clear()
    srv2.submit(buf)
    queued2, _, _ = srv2._q.get_nowait()
    assert queued2 is buf
    srv._stop.set()
    srv2._stop.set()


def test_socket_stop_unblocks_live_connections(rng, tmp_path):
    """Setting the stop event must end LIVE connections, not just the
    accept loop: handler readers block in recv with no timeout, so a
    'stopped' daemon would otherwise keep serving its open sockets and
    leak their threads."""
    import socket
    import time as _time

    model, params = _model_and_params()
    sock_path = str(tmp_path / "fd.sock")
    ready, stop = threading.Event(), threading.Event()
    with InferenceServer(model, params, batch_size=2,
                         image_size=(HW, HW)) as srv:
        st = threading.Thread(
            target=serve_unix_socket, args=(srv, sock_path),
            kwargs=dict(ready=ready, stop=stop, log=lambda *a: None),
            daemon=True)
        st.start()
        assert ready.wait(timeout=30)
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.connect(sock_path)  # idle connection, reader parked in recv
        _time.sleep(0.3)
        stop.set()
        st.join(timeout=10)
        assert not st.is_alive()
        # the server side must have shut the connection down: the client
        # sees EOF instead of blocking forever
        conn.settimeout(10)
        assert conn.recv(1) == b""
        conn.close()


def test_close_is_fast_when_drainer_idle():
    """close() must not wait out its close_timeout when the drainer
    holds no in-flight work — an idle drainer exits within one get
    timeout, and a wedged-transport scenario (CLAUDE.md: multi-hour
    outages) is bounded by close_timeout, not 10 minutes."""
    import time as _time

    model, params = _model_and_params()
    srv = InferenceServer(model, params, batch_size=2, image_size=(HW, HW),
                          close_timeout=600.0)
    srv(np.zeros((HW, HW, 3), np.float32))  # compile + prove it serves
    t0 = _time.perf_counter()
    srv.close()
    assert _time.perf_counter() - t0 < 15.0
    assert not srv._thread.is_alive()


def test_close_resolves_every_queued_future():
    """The close() contract: work the drainer already claimed finishes
    serving (busy-aware join, the r4 advisor fix); anything still in
    the queue is failed loudly ("server is closed") — and NOTHING is
    left unresolved to hang a waiting client."""
    model, params = _model_and_params()
    srv = InferenceServer(model, params, batch_size=2, image_size=(HW, HW),
                          close_timeout=120.0)
    srv(np.zeros((HW, HW, 3), np.float32))  # warm the graph
    futs = [srv.submit(np.zeros((HW, HW, 3), np.float32))
            for _ in range(6)]
    srv.close()
    assert all(f.done() for f in futs)
    served = sum(1 for f in futs if f.exception() is None)
    assert served >= 1  # in-flight work completed, not failed early
    for f in futs:
        if f.exception() is not None:
            assert "closed" in str(f.exception())
