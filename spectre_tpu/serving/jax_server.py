"""Accelerator-backed serving: the SPQ2 protocol over a jitted JAX model.

The native daemon (native/serving/spectre_serve.cc) serves the C++ CPU
runtime; this server speaks the SAME length-prefixed wire protocol (SPQ2 /
SPQ3 / SPR1 / SPER / SPA1 — spectre_tpu/serving/client.py documents the
frames) but
executes the model as ONE jitted XLA program per batch bucket on whatever
backend JAX has — on a TPU host that is the chip, which is where production
inference throughput lives (the C++ daemon is the no-JAX-deployment story;
reference parity target: the ghost Rust inference crate, SURVEY.md §2.2).

Architecture mirrors the C++ daemon:
- one thread per connection reads/validates frames and enqueues sample
  ranges on a shared dynamic batcher (oversized requests are split into
  max_batch chunks and reassembled in order);
- ONE batcher thread coalesces samples across concurrent requests (up to
  ``max_batch``; continuous batching — it grabs whatever is queued the
  moment the device is free, waiting at most ``batch_timeout_s`` for more),
  pads the coalesced batch up to the next power-of-two BUCKET so XLA sees a
  handful of static shapes (one compile per bucket, amortized forever)
  and answers each request's future with its slice.

All JAX dispatch happens on the single batcher thread — connection threads
touch only numpy and sockets.
"""

from __future__ import annotations

import hmac
import os
import queue
import socket
import struct
import threading
from concurrent.futures import Future

import jax
import numpy as np


def _read_full(sock: socket.socket, n: int) -> bytes | None:
    buf = bytearray()  # amortized-linear append (bytes += is quadratic)
    while len(buf) < n:
        try:
            chunk = sock.recv(n - len(buf))
        except OSError:
            return None
        if not chunk:
            return None
        buf += chunk
    return bytes(buf)


def _send_error(sock: socket.socket, msg: str) -> bool:
    try:
        m = msg.encode()
        sock.sendall(b"SPER" + struct.pack("<I", len(m)) + m)
        return True
    except OSError:
        return False


class JaxServer:
    """Serve ``apply_fn(images[B,C,H,W] f32) -> logits[B,classes]`` over the
    SPQ2 protocol with dynamic cross-request batching on the JAX backend.

    ``apply_fn`` is jitted here (one compile per power-of-two batch bucket).
    Use ``from_config`` to build one from a config + optional checkpoint the
    way ``repl/serve.py --backend jax`` does.
    """

    def __init__(self, apply_fn, input_shape: tuple[int, int, int],
                 max_batch: int = 256, batch_timeout_s: float = 0.0,
                 token: str | None = None, mesh=None):
        import jax.numpy as jnp

        # multi-chip serving: with a mesh, every bucket is sharded over the
        # data axis and the forward runs as ONE SPMD program across all
        # chips (params replicate via GSPMD; activations stay sharded).
        # Buckets are padded up to a multiple of the data-axis size so the
        # batch always divides.
        self.mesh = mesh
        self._min_bucket = 1
        if mesh is not None:
            from spectre_tpu.parallel import batch_sharding

            self._min_bucket = int(mesh.devices.shape[0])
            if max_batch % self._min_bucket:
                raise ValueError(
                    f"max_batch={max_batch} must divide over the mesh data "
                    f"axis ({self._min_bucket} devices)")
            bs = batch_sharding(mesh)
            self._apply = jax.jit(apply_fn, in_shardings=bs)
            self._apply_u8 = jax.jit(
                lambda x: apply_fn(x.astype(jnp.float32) / 255.0),
                in_shardings=bs)
        else:
            self._apply = jax.jit(apply_fn)
            # SPQ3 wire: raw u8 pixels (what image datasets actually store)
            # ship at 1/4 the bytes of f32 and upcast/scale ON the
            # accelerator — the host->device transfer is the serving
            # bottleneck long before the forward is (measured: BASELINE.md
            # serving section)
            self._apply_u8 = jax.jit(
                lambda x: apply_fn(x.astype(jnp.float32) / 255.0))
        self.input_shape = tuple(int(d) for d in input_shape)  # (C, H, W)
        self.max_batch = int(max_batch)
        self.batch_timeout_s = float(batch_timeout_s)
        self._token = token or ""
        self._jobs: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._listener: socket.socket | None = None
        self._threads: list[threading.Thread] = []
        self._uds_path: str | None = None
        self._lock_fd: int | None = None

    # -- lifecycle ---------------------------------------------------------

    def listen_tcp(self, host: str = "127.0.0.1", port: int = 0) -> int:
        if host != "127.0.0.1" and not self._token:
            raise ValueError(
                "binding a non-loopback host requires a token — an exposed "
                "port must not be an open inference endpoint (same stance "
                "as the native daemon; front with TLS across untrusted "
                "networks)")
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind((host, port))
        s.listen(64)
        self._listener = s
        self._start_threads()
        return s.getsockname()[1]

    def listen_uds(self, path: str) -> str:
        import fcntl
        import stat

        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        # Serialize probe+unlink+bind across concurrently starting servers
        # (TOCTOU: two racers can both pass the liveness probe and the
        # second's unlink orphans the first's fresh socket). The sidecar
        # flock is held for the server's lifetime — same recipe as the
        # native daemon (native/serving/spectre_serve.cc).
        self._lock_fd = os.open(path + ".lock", os.O_CREAT | os.O_RDWR, 0o600)
        try:
            fcntl.flock(self._lock_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            os.close(self._lock_fd)
            self._lock_fd = None
            raise OSError(
                f"another server is starting/running on {path} "
                f"(lock {path}.lock)")
        if os.path.exists(path):
            # never delete a non-socket file (a typo'd path must not destroy
            # data); connect() to a regular file also reports ECONNREFUSED,
            # so the probe alone cannot tell them apart
            if not stat.S_ISSOCK(os.stat(path).st_mode):
                raise OSError(f"{path} exists and is not a socket")
            # refuse to hijack a live server; unlink only a dead socket
            probe = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            try:
                probe.connect(path)
                probe.close()
                raise OSError(f"{path} has a live server")
            except (ConnectionRefusedError, FileNotFoundError):
                os.unlink(path)
            finally:
                probe.close()
        s.bind(path)
        s.listen(64)
        self._listener = s
        self._uds_path = path
        self._start_threads()
        return path

    def _start_threads(self):
        t = threading.Thread(target=self._accept_loop, daemon=True)
        b = threading.Thread(target=self._batcher_loop, daemon=True)
        t.start()
        b.start()
        self._threads += [t, b]

    def close(self):
        self._stop.set()
        if self._listener is not None:
            try:
                self._listener.close()
            except OSError:
                pass
        self._jobs.put(None)  # wake the batcher
        for t in self._threads:
            t.join(timeout=5)
        if self._uds_path and os.path.exists(self._uds_path):
            try:
                os.unlink(self._uds_path)
            except OSError:
                pass
        if self._lock_fd is not None:
            os.close(self._lock_fd)  # releases the flock
            self._lock_fd = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- connection handling -------------------------------------------------

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._listener.accept()
            except OSError:
                return  # listener closed
            t = threading.Thread(target=self._serve_conn, args=(conn,),
                                 daemon=True)
            t.start()

    def _serve_conn(self, conn: socket.socket):
        c, h, w = self.input_shape
        img_elems = c * h * w
        first = True
        try:
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        except OSError:
            pass  # UDS has no TCP options
        with conn:
            while not self._stop.is_set():
                magic = _read_full(conn, 4)
                if magic is None:
                    return
                if first:
                    first = False
                    if magic == b"SPA1":
                        raw = _read_full(conn, 4)
                        if raw is None:
                            return
                        (n,) = struct.unpack("<I", raw)
                        if n > 4096:
                            return
                        got = _read_full(conn, n) if n else b""
                        if got is None:
                            return
                        if self._token and not hmac.compare_digest(
                                got, self._token.encode()):
                            _send_error(conn, "auth failed")
                            return
                        try:
                            conn.sendall(b"SPOK")
                        except OSError:
                            return
                        continue
                    if self._token:
                        _send_error(conn, "auth required")
                        return
                dtype = np.float32
                if magic in (b"SPQ2", b"SPQ3"):
                    if magic == b"SPQ3":
                        dtype = np.uint8  # raw pixels, upcast on device
                    hdr = _read_full(conn, 16)
                    if hdr is None:
                        return
                    batch, qc, qh, qw = struct.unpack("<IIII", hdr)
                    if (qc, qh, qw) != (c, h, w):
                        # drain the mis-shaped payload so the connection
                        # survives for the client's next (valid) request —
                        # but only up to 1 GiB: dims and batch are client
                        # framing, and buffering an arbitrarily large bogus
                        # payload is a memory hole, not a courtesy
                        n_bad = dtype().itemsize * batch * qc * qh * qw
                        if n_bad > 1 << 30:
                            _send_error(conn, "bad dims")
                            return
                        if _read_full(conn, n_bad) is None:
                            return
                        if not _send_error(
                                conn,
                                f"input dims ({qc},{qh},{qw}) do not match "
                                f"model ({c},{h},{w})"):
                            return
                        continue
                elif magic == b"SPQ1":
                    hdr = _read_full(conn, 4)
                    if hdr is None:
                        return
                    (batch,) = struct.unpack("<I", hdr)
                else:
                    _send_error(conn, "bad magic")
                    return
                if batch == 0 or batch > 1 << 20:
                    _send_error(conn, "bad batch")
                    return
                # same 1 GiB memory-hole bound as the bad-dims drain above:
                # a WELL-FORMED header can still declare a multi-GB payload
                # (flagship f32 at batch 2^20 is ~12.9 GB) — refuse before
                # buffering rather than OOM the serving host
                if dtype().itemsize * batch * img_elems > 1 << 30:
                    _send_error(conn, "payload too large (1 GiB cap)")
                    return
                payload = _read_full(
                    conn, dtype().itemsize * batch * img_elems)
                if payload is None:
                    return
                x = np.frombuffer(payload, dtype).reshape(batch, c, h, w)
                # split oversize requests into max_batch chunks; the batcher
                # answers each future independently and replies stream back
                # in order on this connection
                futs = []
                for s0 in range(0, batch, self.max_batch):
                    part = x[s0:s0 + self.max_batch]
                    f: Future = Future()
                    self._jobs.put((part, f))
                    futs.append(f)
                outs = []
                failed = None
                for f in futs:
                    try:
                        outs.append(f.result(timeout=120))
                    except Exception as e:  # noqa: BLE001 — relayed to client
                        failed = e
                        break
                if failed is not None:
                    if not _send_error(conn, f"inference failed: {failed}"):
                        return
                    continue
                logits = np.concatenate(outs, axis=0)
                try:
                    conn.sendall(
                        b"SPR1"
                        + struct.pack("<II", logits.shape[0], logits.shape[1])
                        + np.ascontiguousarray(logits, np.float32).tobytes())
                except OSError:
                    return

    # -- the batcher ---------------------------------------------------------

    @staticmethod
    def _bucket(n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return b

    @staticmethod
    def _resolve(pending):
        """Fetch a dispatched batch's logits (D2H sync) and answer its
        requests. Called AFTER the next batch has been dispatched, so the
        next batch's host->device transfer and forward overlap this fetch —
        a one-deep pipeline (measured the winning depth; deeper queues add
        latency without throughput, BASELINE.md serving section)."""
        parts, device_out = pending
        try:
            logits = np.asarray(device_out)
        except Exception as e:  # noqa: BLE001 — fan the error out
            for _, f in parts:
                f.set_exception(e)
            return
        off = 0
        for part, f in parts:
            n = part.shape[0]
            f.set_result(logits[off:off + n])
            off += n

    def _batcher_loop(self):
        c, h, w = self.input_shape
        pending = None  # (parts, device_out) dispatched but not fetched
        while True:
            try:
                job = self._jobs.get_nowait()
            except queue.Empty:
                if pending is not None:
                    # idle: nothing to overlap with — answer now
                    self._resolve(pending)
                    pending = None
                job = self._jobs.get()
            if job is None or self._stop.is_set():
                if pending is not None:
                    self._resolve(pending)
                return
            parts = [job]
            total = job[0].shape[0]
            wire = job[0].dtype
            # continuous batching: coalesce whatever else is queued (and, if
            # configured, wait batch_timeout_s for more) up to max_batch;
            # only same-wire-dtype requests share a compiled program
            deadline = (None if self.batch_timeout_s == 0
                        else self.batch_timeout_s)
            while total < self.max_batch:
                try:
                    nxt = self._jobs.get(
                        timeout=deadline) if deadline else self._jobs.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    self._jobs.put(None)  # re-post the stop token
                    break
                if (total + nxt[0].shape[0] > self.max_batch
                        or nxt[0].dtype != wire):
                    self._jobs.put(nxt)  # doesn't fit; next round
                    break
                parts.append(nxt)
                total += nxt[0].shape[0]
                deadline = None  # only wait once
            x = np.concatenate([p[0] for p in parts], axis=0)
            bucket = min(self._bucket(total), self.max_batch)
            if bucket % self._min_bucket:
                # multi-chip: round up to a multiple of the data-axis size
                # so the bucket shards evenly (still a handful of compiles)
                bucket = min(
                    -(-bucket // self._min_bucket) * self._min_bucket,
                    self.max_batch)
            if bucket > total:
                x = np.concatenate(
                    [x, np.zeros((bucket - total, c, h, w), wire)], axis=0)
            apply_fn = self._apply_u8 if wire == np.uint8 else self._apply
            try:
                out = apply_fn(x)  # async dispatch; fetch happens in resolve
            except Exception as e:  # noqa: BLE001
                for _, f in parts:
                    f.set_exception(e)
                continue
            if pending is not None:
                self._resolve(pending)
            pending = (parts, out)


def from_config(config, checkpoint: str | None = None, **kw) -> JaxServer:
    """Build a JaxServer for a parsed config: construct the model, seed or
    restore params, close over a deterministic apply. Mirrors what
    ``repl/export.py`` stages for the native daemon, minus the export.
    Pass ``mesh=create_mesh()`` to serve one SPMD forward across every
    local chip (buckets shard over the data axis)."""
    import jax.numpy as jnp

    from spectre_tpu.models import build_model, example_input

    model = build_model(config)
    x0 = example_input(config, batch_size=1)
    variables = model.init(
        jax.random.key(getattr(config, "random_seed", 42)), x0)
    if checkpoint:
        # deployment restores the BEST-metric step when one is recorded
        # (mirrors repl/export.py), falling back to latest
        from spectre_tpu.train.checkpoint import CheckpointManager
        from spectre_tpu.train.optim import make_optimizer
        from spectre_tpu.train.state import create_train_state

        tx = make_optimizer(config, steps_per_epoch=1)
        state = create_train_state(model, tx, x0)
        mgr = CheckpointManager(checkpoint)
        best = mgr.best_step
        state = mgr.restore(
            state, step=best if best is not None else mgr.latest_step)
        variables = state.variables()

    def apply_fn(images):
        return model.apply(variables, jnp.asarray(images))

    shape = (int(config.in_channels), int(config.img_size),
             int(config.img_size))
    return JaxServer(apply_fn, shape, **kw)
