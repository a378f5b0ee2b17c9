"""JAX-backend serving (serving/jax_server.py): same SPQ2 wire protocol as
the native daemon, exercised with the same client — parity against the live
model, dynamic batching demux under concurrency, bucket padding, oversize
splitting, shape rejection with connection survival, and token auth."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectre_tpu.models import SpectreViT
from spectre_tpu.serving import SpectreClient
from spectre_tpu.serving.jax_server import JaxServer


@pytest.fixture(scope="module")
def served_jax():
    model = SpectreViT(img_size=8, patch_size=4, in_channels=3,
                       num_classes=10, embed_dim=16, num_encoders=1,
                       num_heads=2, hidden_dim=24, dropout=0.0)
    x0 = jnp.zeros((1, 3, 8, 8))
    variables = model.init(jax.random.key(0), x0)

    def apply_fn(images):
        return model.apply(variables, images)

    srv = JaxServer(apply_fn, (3, 8, 8), max_batch=8)
    port = srv.listen_tcp()
    yield srv, port, apply_fn
    srv.close()


def _rand(b, seed=0):
    return np.random.default_rng(seed).uniform(
        0, 1, (b, 3, 8, 8)).astype(np.float32)


def test_jax_serving_parity(served_jax):
    srv, port, apply_fn = served_jax
    x = _rand(4)
    want = np.asarray(apply_fn(x))
    with SpectreClient(port=port) as c:
        got = c.infer(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_jax_serving_bucket_padding_is_invisible(served_jax):
    """An odd-sized request is padded up to the power-of-two bucket inside
    the server; the padding must never leak into the reply."""
    srv, port, apply_fn = served_jax
    for b in (1, 3, 5, 7):
        x = _rand(b, seed=b)
        want = np.asarray(apply_fn(x))
        with SpectreClient(port=port) as c:
            got = c.infer(x)
        assert got.shape == (b, 10)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_jax_serving_oversize_request_split(served_jax):
    """A request larger than max_batch (8) is split into chunks and the
    replies reassembled in order."""
    srv, port, apply_fn = served_jax
    x = _rand(21, seed=3)
    want = np.asarray(apply_fn(x[:8]))
    with SpectreClient(port=port) as c:
        got = c.infer(x)
    assert got.shape == (21, 10)
    np.testing.assert_allclose(got[:8], want, rtol=1e-5, atol=1e-6)


def test_jax_serving_concurrent_clients_demux(served_jax):
    """Concurrent requests are coalesced by the batcher; each client must
    get exactly its own slice back."""
    srv, port, apply_fn = served_jax
    n_clients, errs = 6, []

    def worker(i):
        try:
            x = _rand(2, seed=100 + i)
            want = np.asarray(apply_fn(x))
            with SpectreClient(port=port) as c:
                for _ in range(5):
                    got = c.infer(x)
                    np.testing.assert_allclose(got, want,
                                               rtol=1e-5, atol=1e-6)
        except Exception as e:  # noqa: BLE001
            errs.append((i, e))

    ts = [threading.Thread(target=worker, args=(i,))
          for i in range(n_clients)]
    [t.start() for t in ts]
    [t.join(timeout=60) for t in ts]
    assert not errs, errs


def test_jax_serving_rejects_shape_mismatch_and_survives(served_jax):
    srv, port, apply_fn = served_jax
    with SpectreClient(port=port) as c:
        bad = np.zeros((2, 3, 16, 16), np.float32)
        with pytest.raises(RuntimeError, match="do not match"):
            c.infer(bad)
        x = _rand(2, seed=9)
        got = c.infer(x)  # same connection still works
        np.testing.assert_allclose(got, np.asarray(apply_fn(x)),
                                   rtol=1e-5, atol=1e-6)


def test_jax_serving_token_auth():
    model = SpectreViT(img_size=8, patch_size=4, in_channels=3,
                       num_classes=10, embed_dim=16, num_encoders=1,
                       num_heads=2, hidden_dim=24, dropout=0.0)
    variables = model.init(jax.random.key(1), jnp.zeros((1, 3, 8, 8)))

    def apply_fn(images):
        return model.apply(variables, images)

    with JaxServer(apply_fn, (3, 8, 8), max_batch=8,
                   token="jx-secret") as srv:
        port = srv.listen_tcp()
        x = _rand(2)
        with SpectreClient(port=port, token="jx-secret") as c:
            assert c.infer(x).shape == (2, 10)
        with pytest.raises(PermissionError):
            SpectreClient(port=port, token="nope")
        with pytest.raises((RuntimeError, ConnectionError)):
            with SpectreClient(port=port) as c:  # no auth frame
                c.infer(x)
        # non-loopback bind without a token refuses (same stance as native)
    with pytest.raises(ValueError, match="requires a token"):
        JaxServer(apply_fn, (3, 8, 8)).listen_tcp(host="0.0.0.0")


def test_jax_serving_uds(tmp_path):
    model = SpectreViT(img_size=8, patch_size=4, in_channels=3,
                       num_classes=10, embed_dim=16, num_encoders=1,
                       num_heads=2, hidden_dim=24, dropout=0.0)
    variables = model.init(jax.random.key(2), jnp.zeros((1, 3, 8, 8)))

    def apply_fn(images):
        return model.apply(variables, images)

    path = str(tmp_path / "spectre_jax.sock")
    with JaxServer(apply_fn, (3, 8, 8), max_batch=8) as srv:
        addr = srv.listen_uds(path)
        x = _rand(3, seed=5)
        with SpectreClient(uds=addr) as c:
            got = c.infer(x)
        np.testing.assert_allclose(got, np.asarray(apply_fn(x)),
                                   rtol=1e-5, atol=1e-6)


def test_jax_serving_uds_safety(tmp_path):
    """UDS bind hygiene (parity with the native daemon): never unlink a
    non-socket file, refuse a live server's socket, and serialize the
    probe+unlink+bind sequence with a sidecar flock."""
    model = SpectreViT(img_size=8, patch_size=4, in_channels=3,
                       num_classes=10, embed_dim=16, num_encoders=1,
                       num_heads=2, hidden_dim=24, dropout=0.0)
    variables = model.init(jax.random.key(3), jnp.zeros((1, 3, 8, 8)))

    def apply_fn(images):
        return model.apply(variables, images)

    # a regular file at the socket path must survive
    data = tmp_path / "precious.txt"
    data.write_text("do not delete")
    with pytest.raises(OSError, match="not a socket"):
        JaxServer(apply_fn, (3, 8, 8)).listen_uds(str(data))
    assert data.read_text() == "do not delete"

    # a second server on a live socket path must refuse (flock held)
    path = str(tmp_path / "live.sock")
    with JaxServer(apply_fn, (3, 8, 8)) as srv:
        srv.listen_uds(path)
        with pytest.raises(OSError, match="starting/running"):
            JaxServer(apply_fn, (3, 8, 8)).listen_uds(path)
        x = _rand(2, seed=11)
        with SpectreClient(uds=path) as c:
            np.testing.assert_allclose(c.infer(x), np.asarray(apply_fn(x)),
                                       rtol=1e-5, atol=1e-6)
    # after close the lock is released and the path is reusable
    with JaxServer(apply_fn, (3, 8, 8)) as srv2:
        srv2.listen_uds(path)
        with SpectreClient(uds=path) as c:
            assert c.infer(_rand(1)).shape == (1, 10)


def test_jax_serving_multichip_mesh(devices):
    """mesh= serves ONE SPMD forward across all devices: buckets pad up to a
    multiple of the data-axis size, shard over it, and replies stay
    identical to the single-device path (including odd batches and the u8
    wire)."""
    from spectre_tpu.parallel import create_mesh

    model = SpectreViT(img_size=8, patch_size=4, in_channels=3,
                       num_classes=10, embed_dim=16, num_encoders=1,
                       num_heads=2, hidden_dim=24, dropout=0.0)
    variables = model.init(jax.random.key(4), jnp.zeros((1, 3, 8, 8)))

    def apply_fn(images):
        return model.apply(variables, images)

    mesh = create_mesh()
    n_data = mesh.devices.shape[0]
    assert n_data == 8  # conftest's virtual 8-device mesh

    with pytest.raises(ValueError, match="must divide"):
        JaxServer(apply_fn, (3, 8, 8), max_batch=n_data + 1, mesh=mesh)

    with JaxServer(apply_fn, (3, 8, 8), max_batch=16, mesh=mesh) as srv:
        # the compiled forward really shards the batch over the data axis
        probe = np.zeros((16, 3, 8, 8), np.float32)
        assert "data" in str(srv._apply.lower(probe).compile()
                             .input_shardings[0][0].spec)
        port = srv.listen_tcp()
        for b in (1, 3, 8, 16, 21):  # sub-mesh, odd, exact, full, oversize
            x = _rand(b, seed=40 + b)
            want = np.asarray(apply_fn(x))
            with SpectreClient(port=port) as c:
                got = c.infer(x)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        u8 = np.random.default_rng(44).integers(
            0, 256, (5, 3, 8, 8)).astype(np.uint8)
        with SpectreClient(port=port) as c:
            np.testing.assert_allclose(
                c.infer_u8(u8), np.asarray(apply_fn(u8.astype(np.float32) / 255.0)),
                rtol=1e-5, atol=1e-6)


def test_jax_serving_u8_wire_matches_f32(served_jax):
    """SPQ3 (raw u8 pixels, /255 on the accelerator) must match the f32
    wire path for u8-born inputs — and a mixed u8/f32 concurrent load must
    still demux correctly (the batcher only coalesces same-dtype runs)."""
    srv, port, apply_fn = served_jax
    u8 = np.random.default_rng(7).integers(
        0, 256, (5, 3, 8, 8)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    with SpectreClient(port=port) as c:
        got_u8 = c.infer_u8(u8)
        got_f32 = c.infer(f32)
    np.testing.assert_allclose(got_u8, got_f32, rtol=1e-5, atol=1e-6)

    errs = []

    def worker(i):
        try:
            with SpectreClient(port=port) as c:
                for _ in range(4):
                    if i % 2:
                        np.testing.assert_allclose(
                            c.infer_u8(u8), got_u8, rtol=1e-5, atol=1e-6)
                    else:
                        np.testing.assert_allclose(
                            c.infer(f32), got_f32, rtol=1e-5, atol=1e-6)
        except Exception as e:  # noqa: BLE001
            errs.append((i, e))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    [t.start() for t in ts]
    [t.join(timeout=60) for t in ts]
    assert not errs, errs


def test_jax_serving_refuses_over_1gib_payload():
    """A WELL-FORMED header can still declare a multi-GB payload (flagship
    f32 at the 2^20 batch cap is ~12.9 GB); the server must refuse before
    buffering rather than OOM (serving/jax_server.py payload bound). The
    header is refused without reading the body, so no payload is sent."""
    import socket
    import struct

    def apply_fn(images):  # never reached: the request is refused pre-read
        raise AssertionError("model must not run for a refused payload")

    with JaxServer(apply_fn, (3, 224, 224), max_batch=8) as srv:
        port = srv.listen_tcp()
        with socket.create_connection(("127.0.0.1", port), timeout=30) as s:
            # batch=2000 < 2^20 (passes the batch check) but
            # 2000 * 3*224*224 * 4 B ~= 1.2 GB > the 1 GiB payload bound
            s.sendall(b"SPQ2" + struct.pack("<IIII", 2000, 3, 224, 224))
            # recv may legally return short reads — drain each field fully
            # (the server has _read_full for the same reason)
            def recv_all(k):
                buf = bytearray()
                while len(buf) < k:
                    chunk = s.recv(k - len(buf))
                    assert chunk, "server closed mid-reply"
                    buf += chunk
                return bytes(buf)

            assert recv_all(4) == b"SPER"
            (n,) = struct.unpack("<I", recv_all(4))
            assert b"payload too large" in recv_all(n)
