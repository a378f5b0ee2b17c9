"""Native serving daemon: logits parity vs JAX + measured request latency.

VERDICT r1 next-step #10: a batching micro-server over the C++ runner with
measured p50/p99. The test exports a tiny flagship-topology model, starts
spectre_serve, and drives it through the Python client: single requests,
batched requests, concurrent-connection requests, protocol errors.
"""

import os
import struct
import subprocess
import time
from types import SimpleNamespace

import numpy as np
import pytest

from conftest import tiny_export_cfg as _cfg  # noqa: E402


@pytest.fixture(scope="module")
def served(tmp_path_factory, native_build):
    from spectre_tpu.repl.export import export_from_config
    from spectre_tpu.serving import start_server

    outdir = str(tmp_path_factory.mktemp("serve_export"))
    export_from_config(_cfg(), outdir=outdir, batch=4)
    proc, port = start_server(outdir)
    yield outdir, port
    proc.kill()


def test_serving_logits_match_jax(served):
    from spectre_tpu.serving import SpectreClient

    outdir, port = served
    want = np.fromfile(f"{outdir}/example_logits.f32", np.float32).reshape(4, 10)
    x = np.fromfile(f"{outdir}/example_input.f32", np.float32).reshape(4, 3, 8, 8)
    with SpectreClient(port=port) as client:
        got = client.infer(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert (np.argmax(got, -1) == np.argmax(want, -1)).all()


def test_serving_over_unix_domain_socket(served, tmp_path):
    """Same protocol over AF_UNIX (--uds): logits parity + error handling."""
    from spectre_tpu.serving import SpectreClient, start_server

    outdir, _ = served
    path = str(tmp_path / "spectre.sock")
    proc, addr = start_server(outdir, uds=path)
    try:
        assert addr == path and os.path.exists(path)
        want = np.fromfile(f"{outdir}/example_logits.f32",
                           np.float32).reshape(4, 10)
        x = np.fromfile(f"{outdir}/example_input.f32",
                        np.float32).reshape(4, 3, 8, 8)
        with SpectreClient(uds=addr) as client:
            got = client.infer(x)
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
            # shape rejection still answers on the same connection
            with pytest.raises(RuntimeError, match="shape mismatch"):
                client.infer(np.zeros((1, 3, 16, 16), np.float32))
            np.testing.assert_allclose(client.infer(x), want,
                                       rtol=1e-4, atol=1e-4)
        # a second server must NOT hijack the live socket: the sidecar
        # flock (held for the daemon's lifetime) rejects it before the
        # probe+unlink+bind sequence even starts
        from spectre_tpu.serving.client import SERVER_BIN
        r = subprocess.run(
            [SERVER_BIN, "--weights", f"{outdir}/weights.stw",
             "--meta", f"{outdir}/meta.txt", "--uds", path],
            capture_output=True, text=True, timeout=30)
        assert r.returncode != 0 and "another server" in r.stderr
        with SpectreClient(uds=path) as client:  # original still serving
            np.testing.assert_allclose(client.infer(x), want,
                                       rtol=1e-4, atol=1e-4)
    finally:
        proc.kill()
    # a typo'd --uds path at an existing regular file must not delete it
    victim = tmp_path / "precious.txt"
    victim.write_text("data")
    r = subprocess.run(
        [SERVER_BIN, "--weights", f"{outdir}/weights.stw",
         "--meta", f"{outdir}/meta.txt", "--uds", str(victim)],
        capture_output=True, text=True, timeout=30)
    assert r.returncode != 0 and victim.read_text() == "data"


def test_serving_persistent_connection_and_latency(served):
    """Many requests over one connection; record p50/p99."""
    from spectre_tpu.serving import SpectreClient

    outdir, port = served
    rng = np.random.default_rng(0)
    lat = []
    with SpectreClient(port=port) as client:
        for _ in range(50):
            x = rng.uniform(0, 1, (1, 3, 8, 8)).astype(np.float32)
            t0 = time.perf_counter()
            out = client.infer(x)
            lat.append((time.perf_counter() - t0) * 1e3)
            assert out.shape == (1, 10)
            assert np.isfinite(out).all()
    p50 = float(np.percentile(lat, 50))
    p99 = float(np.percentile(lat, 99))
    print(f"\nserving latency tiny-model single-image: p50={p50:.2f} ms p99={p99:.2f} ms")
    assert p99 < 1000.0  # sanity: a tiny model request is not seconds


def test_serving_concurrent_connections(served):
    from concurrent.futures import ThreadPoolExecutor

    from spectre_tpu.serving import SpectreClient

    outdir, port = served
    x = np.fromfile(f"{outdir}/example_input.f32", np.float32).reshape(4, 3, 8, 8)
    want = np.fromfile(f"{outdir}/example_logits.f32", np.float32).reshape(4, 10)

    def one(_):
        with SpectreClient(port=port) as c:
            return c.infer(x)

    with ThreadPoolExecutor(4) as ex:
        for got in ex.map(one, range(8)):
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dynamic_batcher_demux_correctness(served):
    """Many concurrent mixed-size requests coalesce in the dynamic batcher;
    every response must contain exactly ITS samples' logits (demux order)."""
    from concurrent.futures import ThreadPoolExecutor

    from spectre_tpu.serving import SpectreClient

    outdir, port = served
    x = np.fromfile(f"{outdir}/example_input.f32", np.float32).reshape(4, 3, 8, 8)
    want = np.fromfile(f"{outdir}/example_logits.f32", np.float32).reshape(4, 10)
    rng = np.random.default_rng(3)
    # slices precomputed (a numpy Generator is not thread-safe)
    slices = []
    for _ in range(24):
        k = int(rng.integers(1, 4))
        slices.append((int(rng.integers(0, 4 - k + 1)), k))

    def one(i):
        s, k = slices[i]
        with SpectreClient(port=port) as c:
            got = c.infer(x[s:s + k])
        return s, k, got

    with ThreadPoolExecutor(8) as ex:
        for s, k, got in ex.map(one, range(24)):
            np.testing.assert_allclose(got, want[s:s + k], rtol=1e-4, atol=1e-4)


def test_serving_rejects_bad_magic_and_oversized_batch(served):
    import socket

    outdir, port = served
    s = socket.create_connection(("127.0.0.1", port))
    s.sendall(b"XXXX" + struct.pack("<I", 1))
    head = s.recv(4)
    assert head == b"SPER"
    s.close()

    from spectre_tpu.serving import SpectreClient

    with SpectreClient(port=port) as c:
        with pytest.raises(RuntimeError, match="batch out of range"):
            c.infer(np.zeros((999, 3, 8, 8), np.float32))


def test_serving_rejects_shape_mismatch_and_connection_survives(served):
    """SPQ2 carries the input dims: a client built for a different model
    (e.g. 224x224) gets a protocol error naming the expected shape instead
    of silently wrong logits, and the connection stays usable."""
    from spectre_tpu.serving import SpectreClient

    outdir, port = served
    x_ok = np.fromfile(f"{outdir}/example_input.f32", np.float32).reshape(4, 3, 8, 8)
    want = np.fromfile(f"{outdir}/example_logits.f32", np.float32).reshape(4, 10)
    with SpectreClient(port=port) as c:
        with pytest.raises(RuntimeError, match="shape mismatch.*3x8x8"):
            c.infer(np.zeros((1, 3, 32, 32), np.float32))
        # same connection still serves valid requests afterwards
        got = c.infer(x_ok)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_serving_token_auth(served, tmp_path):
    """Token-gated serving (round 3, remote-transport hardening): a correct
    SPA1 handshake unlocks inference, a wrong token is refused, and a
    request without auth is refused before touching the batcher."""
    import socket
    import struct

    from spectre_tpu.serving import SpectreClient, start_server

    outdir, _ = served
    tok = tmp_path / "token.txt"
    tok.write_text("s3cret-tok3n\n")  # trailing newline must be stripped
    proc, port = start_server(outdir, token_file=str(tok))
    try:
        want = np.fromfile(f"{outdir}/example_logits.f32",
                           np.float32).reshape(4, 10)
        x = np.fromfile(f"{outdir}/example_input.f32",
                        np.float32).reshape(4, 3, 8, 8)
        # correct token: full inference works
        with SpectreClient(port=port, token="s3cret-tok3n") as client:
            np.testing.assert_allclose(client.infer(x), want,
                                       rtol=1e-4, atol=1e-4)
        # wrong token: PermissionError at connect
        with pytest.raises(PermissionError):
            SpectreClient(port=port, token="wrong")
        # no auth frame first: server refuses the request
        with pytest.raises((RuntimeError, ConnectionError)):
            with SpectreClient(port=port) as client:  # no token sent
                client.infer(x)
        # auth must also be accepted by a tokenless server (no-op handshake)
    finally:
        proc.kill()


def test_serving_tokenless_accepts_noop_auth(served):
    """A client that always authenticates still works against a server with
    no token configured (SPA1 is a no-op handshake there)."""
    from spectre_tpu.serving import SpectreClient

    outdir, port = served
    x = np.fromfile(f"{outdir}/example_input.f32",
                    np.float32).reshape(4, 3, 8, 8)
    with SpectreClient(port=port, token="anything") as client:
        assert client.infer(x).shape == (4, 10)


def test_serving_nonloopback_requires_token(served, native_build):
    """Binding a non-loopback host without a token must refuse to start —
    an exposed port is not allowed to be an open inference endpoint."""
    import subprocess

    outdir, _ = served
    env = {k: v for k, v in os.environ.items() if k != "SPECTRE_SERVE_TOKEN"}
    r = subprocess.run(
        [os.path.join(native_build, "spectre_serve"),
         "--weights", f"{outdir}/weights.stw", "--meta", f"{outdir}/meta.txt",
         "--host", "0.0.0.0", "--port", "0"],
        capture_output=True, text=True, env=env, timeout=30)
    assert r.returncode == 2
    assert "requires a token" in r.stderr


def test_serving_u8_wire_matches_f32(served):
    """SPQ3 (raw u8 pixels, /255 server-side) must be bit-identical to the
    f32 wire path for u8-born inputs — same protocol as the JAX backend."""
    from spectre_tpu.serving import SpectreClient

    outdir, port = served
    u8 = np.random.default_rng(11).integers(
        0, 256, (4, 3, 8, 8)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    with SpectreClient(port=port) as c:
        got_u8 = c.infer_u8(u8)
        got_f32 = c.infer(f32)
    np.testing.assert_array_equal(got_u8, got_f32)
