"""Micro-batching inference server engine.

The reference's deploy story ends at a one-shot TVM graph run
(deploy/tx2_run_tvm.py:35-40).  A production serving front end needs the
piece in between: many independent single-frame requests, one
fixed-shape compiled executable.  This engine bridges them the TPU way —
requests queue on the host, a drainer thread packs up to ``batch_size``
frames into the static batch the jit was compiled for (padding the
tail), runs ONE forward, and resolves per-request futures.  Batching is
where this hardware's throughput lives (b128 serves ~19k fps while b1
pays the full per-call overhead; docs/frontier.md), and static shapes
are what keep XLA from retracing.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Optional

import numpy as np


class InferenceServer:
    """Queue + drainer over a jitted fixed-batch forward.

    ``submit(rgb_hwc_float)`` returns a Future resolving to the HW1
    depth prediction.  The drainer packs whatever is queued (up to
    ``batch_size``) the moment the device is free — latency under light
    load (a lone request rides a padded batch immediately), throughput
    under pressure (full batches back-to-back).
    """

    def __init__(
        self,
        model,
        params,
        *,
        batch_size: int = 8,
        image_size=(224, 224),
        dtype=None,
        fold_bn: bool = True,
        impl: str = "auto",
        max_queue: int = 1024,
    ):
        import jax
        import jax.numpy as jnp

        from fastdepth_tpu.engine.aot import _pick_apply

        dtype = dtype or jnp.float32
        if fold_bn:
            params = model.fold(params)
        if dtype != jnp.float32:
            params = jax.tree.map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                params,
            )
        self.params = jax.device_put(params)
        apply_fn = _pick_apply(model, fold_bn, impl, batch_size)

        def forward(p, x):
            return apply_fn(p, x.astype(dtype)).astype(jnp.float32)

        self._fn = jax.jit(forward)
        self.batch_size = batch_size
        self.image_size = tuple(image_size)
        self._q: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    # ---- client side ----

    def submit(self, rgb: np.ndarray) -> Future:
        """Enqueue one HWC float32 RGB frame; returns a Future of the
        (H, W, 1) float32 prediction."""
        h, w = self.image_size
        rgb = np.asarray(rgb, np.float32)
        if rgb.shape != (h, w, 3):
            raise ValueError(f"expected ({h}, {w}, 3) HWC rgb, got {rgb.shape}")
        fut: Future = Future()
        self._q.put((rgb, fut))
        return fut

    def __call__(self, rgb: np.ndarray) -> np.ndarray:
        return self.submit(rgb).result()

    # ---- drainer ----

    def _drain(self):
        h, w = self.image_size
        batch = np.zeros((self.batch_size, h, w, 3), np.float32)
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            if first is None:
                return
            items = [first]
            # pack whatever else is already waiting, up to the batch
            while len(items) < self.batch_size:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    self._stop.set()
                    break
                items.append(nxt)
            n = len(items)
            for i, (rgb, _) in enumerate(items):
                batch[i] = rgb
            if n < self.batch_size:
                batch[n:] = 0.0
            try:
                preds = np.asarray(self._fn(self.params, batch))
            except Exception as e:  # resolve, don't wedge the clients
                for _, fut in items:
                    if not fut.cancelled():
                        fut.set_exception(e)
                continue
            for i, (_, fut) in enumerate(items):
                if not fut.cancelled():
                    fut.set_result(preds[i])

    def close(self):
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def serve_unix_socket(
    server: InferenceServer,
    sock_path: str,
    *,
    ready: Optional[threading.Event] = None,
    stop: Optional[threading.Event] = None,
    log=print,
):
    """Accept loop: length-prefixed ``.npy`` frames over a unix socket.

    Protocol per request: 4-byte big-endian length + ``np.save`` bytes of
    an (H, W, 3) float32 array; the response is the same framing around
    the (H, W, 1) float32 prediction.  One connection may stream many
    requests; each is answered in order.
    """
    import os
    import socket

    stop = stop or threading.Event()
    if os.path.exists(sock_path):
        os.unlink(sock_path)
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(sock_path)
    srv.listen(64)
    srv.settimeout(0.2)
    if ready is not None:
        ready.set()
    log(f"=> serving on {sock_path} (batch {server.batch_size})")

    def handle(conn):
        with conn:
            while not stop.is_set():
                arr = _recv_npy(conn)
                if arr is None:
                    return
                try:
                    pred = server.submit(arr).result()
                    _send_npy(conn, pred)
                except Exception as e:
                    log(f"!! request failed: {type(e).__name__}: {e}")
                    return

    try:
        while not stop.is_set():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            threading.Thread(target=handle, args=(conn,), daemon=True).start()
    finally:
        srv.close()
        if os.path.exists(sock_path):
            os.unlink(sock_path)


def request(sock_path: str, rgb: np.ndarray) -> np.ndarray:
    """One client round trip (also the test/smoke client)."""
    import socket

    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.connect(sock_path)
    try:
        _send_npy(c, np.asarray(rgb, np.float32))
        out = _recv_npy(c)
        if out is None:
            raise ConnectionError("server closed the connection")
        return out
    finally:
        c.close()


def _send_npy(conn, arr: np.ndarray) -> None:
    import io

    buf = io.BytesIO()
    np.save(buf, arr)
    payload = buf.getvalue()
    conn.sendall(len(payload).to_bytes(4, "big") + payload)


def _recv_npy(conn):
    import io

    head = _recv_exact(conn, 4)
    if head is None:
        return None
    n = int.from_bytes(head, "big")
    body = _recv_exact(conn, n)
    if body is None:
        return None
    return np.load(io.BytesIO(body))


def _recv_exact(conn, n: int):
    chunks = []
    got = 0
    while got < n:
        b = conn.recv(n - got)
        if not b:
            return None
        chunks.append(b)
        got += len(b)
    return b"".join(chunks)
