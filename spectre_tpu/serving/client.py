"""Python client + launcher for the native serving daemon.

The daemon (native/serving/spectre_serve.cc) serves an exported .stw model
over a length-prefixed TCP protocol:

    request : b"SPQ1" | u32 batch | batch*C*H*W float32 (NCHW)
    response: b"SPR1" | u32 batch | u32 classes | float32 logits
    error   : b"SPER" | u32 len | message

Usage:

    proc, port = start_server(export_dir)           # or an already-running port
    with SpectreClient(port=port) as client:
        logits = client.infer(images)               # [B, C, H, W] float32
"""

from __future__ import annotations

import os
import socket
import struct
import subprocess
import time

import numpy as np

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
SERVER_BIN = os.path.join(_REPO, "native", "build", "spectre_serve")


def start_server(export_dir: str, port: int = 0, max_batch: int = 256,
                 binary: str | None = None, timeout: float = 30.0):
    """Launch spectre_serve on an exported model directory (weights.stw +
    meta.txt, as written by repl/export.py). Returns (Popen, bound_port)."""
    binary = binary or SERVER_BIN
    import select

    proc = subprocess.Popen(
        [binary,
         "--weights", os.path.join(export_dir, "weights.stw"),
         "--meta", os.path.join(export_dir, "meta.txt"),
         "--port", str(port), "--max-batch", str(max_batch)],
        stdout=subprocess.PIPE, text=True)
    deadline = time.time() + timeout
    line = ""
    while time.time() < deadline:
        # select enforces the timeout even while the daemon prints nothing
        # (a blocking readline would hang past the deadline)
        ready, _, _ = select.select([proc.stdout], [], [],
                                    max(0.0, deadline - time.time()))
        if not ready:
            break
        line = proc.stdout.readline()
        if line.startswith("LISTENING"):
            return proc, int(line.split()[1])
        if proc.poll() is not None and not line:
            break
    proc.kill()
    raise RuntimeError(f"spectre_serve did not come up (last line: {line!r})")


class SpectreClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._sock = socket.create_connection((host, port))
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def infer(self, images: np.ndarray) -> np.ndarray:
        """images: [B, C, H, W] float32 -> logits [B, num_classes]."""
        x = np.ascontiguousarray(images, dtype=np.float32)
        batch = x.shape[0]
        self._sock.sendall(b"SPQ1" + struct.pack("<I", batch) + x.tobytes())
        head = self._recv(4)
        if head == b"SPER":
            (n,) = struct.unpack("<I", self._recv(4))
            raise RuntimeError(f"server error: {self._recv(n).decode()}")
        if head != b"SPR1":
            raise RuntimeError(f"bad response magic {head!r}")
        got_batch, classes = struct.unpack("<II", self._recv(8))
        payload = self._recv(4 * got_batch * classes)
        return np.frombuffer(payload, np.float32).reshape(got_batch, classes)

    def _recv(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed connection")
            buf += chunk
        return buf

    def close(self):
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
