"""Python client + launcher for the native serving daemon.

The daemon (native/serving/spectre_serve.cc) serves an exported .stw model
over a length-prefixed TCP protocol:

    request : b"SPQ2" | u32 batch | u32 C | u32 H | u32 W | float32 pixels
              (the explicit dims let the server reject a shape-mismatched
              client instead of silently mis-framing the stream)
    request : b"SPQ3" | u32 batch | u32 C | u32 H | u32 W | uint8 pixels
              (raw 0-255 pixels — what image datasets store — at 1/4 the
              wire and host->device bytes; the server upcasts and scales
              by 1/255 on the accelerator. Use ``infer_u8``.)
    auth    : b"SPA1" | u32 len | token bytes (first frame; server replies
              b"SPOK" — required when the daemon has a token configured)
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
                 binary: str | None = None, timeout: float = 30.0,
                 uds: str | None = None, host: str | None = None,
                 token_file: str | None = None, int8: bool = False):
    """Launch spectre_serve on an exported model directory (weights.stw +
    meta.txt, as written by repl/export.py). Returns ``(Popen, addr)``:
    ``addr`` is the bound TCP port (int), or the unix-socket path (str) when
    ``uds`` is given (same protocol, skips the loopback TCP stack).

    ``host`` binds a specific interface (daemon default: loopback). A
    non-loopback host requires a shared-secret token — pass ``token_file``
    or export $SPECTRE_SERVE_TOKEN (inherited by the daemon); the daemon
    refuses to start otherwise. The stream is plaintext: front it with
    TLS (stunnel/nginx/ssh) across untrusted networks."""
    binary = binary or SERVER_BIN
    import select

    transport = (["--uds", uds] if uds else ["--port", str(port)])
    if host is not None:
        transport += ["--host", host]
    if token_file is not None:
        transport += ["--token-file", token_file]
    if int8:
        # opt-in VNNI-quantized GEMMs (daemon refuses on non-VNNI builds)
        transport += ["--int8", "1"]
    proc = subprocess.Popen(
        [binary,
         "--weights", os.path.join(export_dir, "weights.stw"),
         "--meta", os.path.join(export_dir, "meta.txt"),
         *transport, "--max-batch", str(max_batch)],
        stdout=subprocess.PIPE)
    # read the RAW pipe fd: select on a buffered TextIOWrapper is unsound
    # (readline can buffer bytes past the returned line, after which select
    # sees an empty pipe even though LISTENING is already in the buffer)
    fd = proc.stdout.fileno()
    deadline = time.time() + timeout
    buf = b""
    while time.time() < deadline:
        ready, _, _ = select.select([fd], [], [],
                                    max(0.0, deadline - time.time()))
        if not ready:
            break
        chunk = os.read(fd, 4096)
        if not chunk:
            break  # EOF: daemon exited
        buf += chunk
        # parse COMPLETE lines only: a read can end mid-line, and a partial
        # b"LISTENING_UDS /tmp/sp" fragment must not be returned as the path
        *lines, buf = buf.split(b"\n")
        for raw in lines:
            line = raw.decode(errors="replace")
            if line.startswith("LISTENING_UDS"):
                return proc, line.split(None, 1)[1]
            if line.startswith("LISTENING"):
                return proc, int(line.split()[1])
    proc.kill()
    raise RuntimeError(
        f"spectre_serve did not come up (output: {buf[-500:]!r})")


class SpectreClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 uds: str | None = None, token: str | None = None):
        """Connect over TCP (host/port) or a unix-domain socket (``uds`` =
        the path printed by the server / returned by ``start_server``).

        ``token``: shared secret for token-gated servers (required when the
        daemon binds a non-loopback host). Sent once as the connection's
        first frame; the server replies SPOK or refuses the connection."""
        if uds is not None:
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.connect(uds)
        else:
            self._sock = socket.create_connection((host, port))
            self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        if token is not None:
            t = token.encode()
            self._sock.sendall(b"SPA1" + struct.pack("<I", len(t)) + t)
            head = self._recv(4)
            if head == b"SPER":
                (n,) = struct.unpack("<I", self._recv(4))
                msg = self._recv(n).decode()
                self._sock.close()
                raise PermissionError(f"server refused auth: {msg}")
            if head != b"SPOK":
                self._sock.close()
                raise RuntimeError(f"bad auth response magic {head!r}")

    def infer(self, images: np.ndarray) -> np.ndarray:
        """images: [B, C, H, W] float32 (normalized to [0, 1]) -> logits
        [B, num_classes]."""
        return self._request(images, np.float32, b"SPQ2")

    def infer_u8(self, images: np.ndarray) -> np.ndarray:
        """images: [B, C, H, W] uint8 RAW pixels (0-255) -> logits.

        Ships 1/4 the bytes of ``infer`` — the wire AND the server's
        host->device transfer — and the server computes ``x / 255`` on the
        accelerator. Numerically identical to ``infer(images / 255.0)``
        when the f32 inputs are exactly representable as k/255 (they are,
        when they came from u8 pixels in the first place)."""
        return self._request(images, np.uint8, b"SPQ3")

    def _request(self, images: np.ndarray, dtype, magic: bytes) -> np.ndarray:
        x = np.ascontiguousarray(images, dtype=dtype)
        if x.ndim != 4:
            raise ValueError(f"images must be [B, C, H, W]; got {x.shape}")
        batch, c, h, w = x.shape
        self._sock.sendall(magic + struct.pack("<IIII", batch, c, h, w)
                           + x.tobytes())
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
