"""Serving layer (cgs_tpu/serve.py): micro-batch coalescing, the
image->mask core, and the HTTP surface (framework extension — the
reference has no online serving; its nearest surface is the offline
-process folder walk, main.py:1103-1223)."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from cgs_tpu.core.config import parse_args
from cgs_tpu.serve import MaskServer


def _png(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = parse_args(["--infer-batch", "16", "--serve-wait-ms", "30",
                      "--model", str(tmp_path_factory.mktemp("srv")
                                     / "norun")])
    srv = MaskServer(cfg)
    yield srv
    srv.batcher.close()


def test_default_coalescing_window_is_2ms():
    """The RESULTS.md serving table (417 req/s @ 128 clients) was
    measured at the DEFAULT window; pin it so doc and code can't
    drift apart again (VERDICT r2 weak #4)."""
    import inspect

    from cgs_tpu.core.config import Config
    from cgs_tpu.serve import MicroBatcher
    assert Config().serve_wait_ms == 2.0
    sig = inspect.signature(MicroBatcher.__init__)
    assert sig.parameters["max_wait_ms"].default == 2.0


def test_segment_bytes_raw_and_thresholded(server, rng):
    frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    png = server.segment_bytes(_png(frame))
    out = Image.open(io.BytesIO(png))
    assert out.size == (64, 64) and out.mode == "L"

    png = server.segment_bytes(_png(frame), variant="thresholded",
                               threshold=0.5)
    vals = np.unique(np.asarray(Image.open(io.BytesIO(png))))
    assert set(vals.tolist()) <= {0, 255}


def test_wrong_size_rejected_unless_resize(server, rng):
    frame = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="64x64"):
        server.segment_bytes(_png(frame))
    png = server.segment_bytes(_png(frame), resize=True)
    assert Image.open(io.BytesIO(png)).size == (48, 32)  # PIL (w, h)


def test_microbatch_coalesces_concurrent_requests(server, rng):
    frames = rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8)
    d0 = server.batcher.stats["dispatches"]
    results = [None] * 8

    def go(i):
        results[i] = server.batcher.submit(frames[i])

    threads = [threading.Thread(target=go, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r.mask.shape == (64, 64) for r in results)
    dispatches = server.batcher.stats["dispatches"] - d0
    assert dispatches < 8, f"no coalescing: {dispatches} dispatches"
    # identical frame -> identical mask regardless of batch slot
    a = server.batcher.submit(frames[0])
    np.testing.assert_allclose(a.mask, results[0].mask, atol=1e-6)


def test_http_surface(server, rng):
    httpd = server.start(port=0)          # OS-assigned free port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["batch"] == 16

        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        req = urllib.request.Request(
            f"{base}/segment?variant=thresholded&threshold=0.4",
            data=_png(frame), method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "image/png"
            out = Image.open(io.BytesIO(r.read()))
        assert out.size == (64, 64)

        # bad variant -> 400 json error
        req = urllib.request.Request(f"{base}/segment?variant=nope",
                                     data=_png(frame), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400

        # wrong size without resize -> 400; with resize -> 200
        small = _png(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
        req = urllib.request.Request(f"{base}/segment", data=small,
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        req = urllib.request.Request(f"{base}/segment?resize=1",
                                     data=small, method="POST")
        with urllib.request.urlopen(req) as r:
            assert Image.open(io.BytesIO(r.read())).size == (32, 32)
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_malformed_body_gets_400_not_connection_reset(server):
    httpd = server.start(port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/segment",
            data=b"this is not an image", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_threshold_boundary_matches_offline_process(server, rng):
    """>= binarization like eval/segment.py — a pixel exactly at the
    threshold is IN the mask."""
    frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    soft = server.batcher.submit(frame).mask
    exact = float(soft[7, 9])
    png = server.segment_bytes(_png(frame), variant="thresholded",
                               threshold=exact)
    out = np.asarray(Image.open(io.BytesIO(png)))
    assert out[7, 9] == 255


def test_batch_failure_fails_requests_but_not_the_server(server, rng):
    from cgs_tpu.serve import ServerError

    frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    pipe = server.batcher.pipeline
    orig = pipe.run_device
    calls = {"n": 0}

    def boom(frames):
        calls["n"] += 1
        raise RuntimeError("injected device failure")

    pipe.run_device = boom
    try:
        with pytest.raises(ServerError, match="injected"):
            server.batcher.submit(frame, timeout=10)
    finally:
        pipe.run_device = orig
    assert calls["n"] == 1
    assert server.batcher.stats["errors"] >= 1
    # both threads survived: the next request completes normally
    req = server.batcher.submit(frame, timeout=30)
    assert req.mask.shape == (64, 64)


def test_bad_shape_frame_rejected_thread_survives(server, rng):
    """A (64, 64) or (3, 64, 64) frame via the public submit() API
    must raise per-request, not kill the dispatch thread (which would
    zombie the server: every later request times out while /healthz
    still said ok)."""
    with pytest.raises(ValueError, match="expected frame shape"):
        server.batcher.submit(rng.integers(0, 256, (64, 64),
                                           dtype=np.uint8))
    with pytest.raises(ValueError, match="expected frame shape"):
        server.batcher.submit(rng.integers(0, 256, (3, 64, 64),
                                           dtype=np.uint8))
    assert not server.batcher._dispatch_dead.is_set()
    frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    assert server.batcher.submit(frame).mask.shape == (64, 64)


def test_abandoned_requests_skip_dispatch(server, rng):
    """A request whose submit() already timed out (client got 503)
    must not spend a device dispatch when it finally drains."""
    from cgs_tpu.serve import _Request

    frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    ghost = _Request(frame=frame)
    ghost.abandoned = True
    d0 = server.batcher.stats["dispatches"]
    server.batcher.q.put(ghost)
    # a live probe behind it proves the loop consumed & skipped ghost
    req = server.batcher.submit(frame, timeout=30)
    assert req.mask.shape == (64, 64)
    assert server.batcher.stats["dispatches"] - d0 >= 1
    assert not ghost.done.is_set()   # never dispatched, never completed


def test_separate_run_serves_sepcrit_features(tmp_path, rng):
    """-separate serving parity: the served mask must equal the
    offline MaskPipeline(separate=True) mask, i.e. the masker reads
    the sepcrit's embeds (main.py:946-947) — not the live critic's."""
    from cgs_tpu.serve import MaskServer as MS

    args = ["--infer-batch", "16", "--serve-wait-ms", "5", "-separate",
            "--model", str(tmp_path / "norun")]
    cfg = parse_args(args)
    assert cfg.separate
    srv = MS(cfg)
    try:
        assert srv.batcher.pipeline.separate
        assert "sepcrit" in srv.batcher.pipeline.params
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        served = srv.batcher.submit(frame).mask
        pipe = srv.batcher.pipeline
        out = pipe.run(np.tile(frame[None], (16, 1, 1, 1)))
        np.testing.assert_allclose(served, out.masks[0, :, :, 0],
                                   atol=1e-6)
    finally:
        srv.batcher.close()


def test_serve_uses_handler_checkpoint_paths(tmp_path, capsys):
    """serve._load_params must look for checkpoints exactly where
    Handler saves them (shared train.checkpoints.checkpoint_paths) —
    a drifted path means silently serving RANDOM weights."""
    from cgs_tpu.train.checkpoints import checkpoint_paths

    cfg = parse_args(["--infer-batch", "16",
                      "--model", str(tmp_path / "norun")])
    srv = MaskServer(cfg)
    srv.batcher.close()
    out = capsys.readouterr().out
    for name in ("critic", "masker"):
        assert checkpoint_paths(cfg)[name] in out


def test_meshed_serving_matches_single_device(tmp_path, rng):
    """--data-parallel N: micro-batch dispatches shard over the DP
    mesh; masks must match the unmeshed server exactly."""
    args = ["--infer-batch", "16", "--serve-wait-ms", "5",
            "--model", str(tmp_path / "norun")]
    frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)

    plain = MaskServer(parse_args(args))
    try:
        want = plain.batcher.submit(frame).mask
    finally:
        plain.batcher.close()

    meshed = MaskServer(parse_args(args + ["--data-parallel", "8"]))
    try:
        assert meshed.batcher.pipeline.mesh is not None
        got = meshed.batcher.submit(frame).mask
    finally:
        meshed.batcher.close()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_http_burst_no_connection_resets(server, rng):
    """A 40-connection burst must not overflow the accept backlog
    (ThreadingHTTPServer defaults to 5 — found via connection resets
    under concurrent load; _Server raises request_queue_size)."""
    import concurrent.futures as cf

    httpd = server.start(port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    body = _png(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    url = f"http://127.0.0.1:{port}/segment"

    def one(_):
        req = urllib.request.Request(url, data=body, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status

    try:
        with cf.ThreadPoolExecutor(max_workers=40) as ex:
            statuses = list(ex.map(one, range(40)))
        assert statuses == [200] * 40
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_reload_checkpoints_hot_swaps_weights(tmp_path, rng):
    """POST /reload semantics: a checkpoint written AFTER server start
    (the continuous-training loop — Handler overwrites the same
    fingerprinted names every --saveevery epochs, main.py:228,565)
    must swap into the live pipeline and change served masks; missing
    files must keep the currently served weights, never re-randomize."""
    import os

    import jax

    from cgs_tpu.train.checkpoints import (
        checkpoint_paths, params_to_host, save_model_pt,
    )

    cfg = parse_args(["--infer-batch", "16", "--serve-wait-ms", "5",
                      "--model", str(tmp_path / "run")])
    os.makedirs(os.path.dirname(checkpoint_paths(cfg)["critic"]),
                exist_ok=True)
    srv = MaskServer(cfg)   # no files yet -> random init
    try:
        # nothing on disk: reload is a no-op that reports both missing
        loaded = srv.reload_checkpoints()
        assert loaded == {"critic": False, "masker": False}
        assert srv.reloads == 0

        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        before = srv.batcher.submit(frame).mask

        # 'train' a new masker (perturb) and publish it Handler-style
        host = params_to_host(srv.pipe.params)
        new_masker = jax.tree.map(lambda a: a + 0.2, host["masker"])
        save_model_pt(new_masker, "masker",
                      checkpoint_paths(cfg)["masker"])
        loaded = srv.reload_checkpoints()
        assert loaded == {"critic": False, "masker": True}
        assert srv.reloads == 1

        after = srv.batcher.submit(frame).mask
        assert np.abs(after - before).max() > 1e-4  # weights swapped
        # the critic sub-tree (missing file) was preserved, not
        # re-randomized
        for a, b in zip(jax.tree.leaves(host["critic"]),
                        jax.tree.leaves(
                            params_to_host(srv.pipe.params)["critic"])):
            np.testing.assert_array_equal(a, b)
    finally:
        srv.batcher.close()


def test_reload_http_endpoint(server):
    """POST /reload returns the per-model load report as JSON (both
    false here: the fixture's run dir has no checkpoints) and /stats
    reports the reload counter."""
    httpd = server.start(port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reload", data=b"", method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
            payload = json.loads(r.read())
        assert payload["reloaded"] == {"critic": False,
                                       "masker": False}
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30) as r:
            assert "reloads" in json.loads(r.read())
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_reload_under_concurrent_traffic(tmp_path, rng):
    """Hot-reload must be safe under load: hammer segment_bytes from
    worker threads while repeatedly swapping checkpoints in — every
    request must complete with a valid mask, no 5xx-class errors."""
    import os

    import jax

    from cgs_tpu.train.checkpoints import (
        checkpoint_paths, params_to_host, save_model_pt,
    )

    cfg = parse_args(["--infer-batch", "8", "--serve-wait-ms", "5",
                      "--model", str(tmp_path / "run")])
    os.makedirs(os.path.dirname(checkpoint_paths(cfg)["masker"]),
                exist_ok=True)
    srv = MaskServer(cfg)
    try:
        host = params_to_host(srv.pipe.params)
        frames = rng.integers(0, 256, (24, 64, 64, 3), dtype=np.uint8)
        errors = []
        done = threading.Event()

        def client(i):
            try:
                for k in range(4):
                    png = srv.segment_bytes(_png(frames[(i + k) % 24]))
                    img = Image.open(io.BytesIO(png))
                    assert img.size == (64, 64)
            except Exception as e:
                errors.append(repr(e))

        def reloader():
            j = 0
            while not done.is_set():
                j += 1
                new = jax.tree.map(lambda a: a + 0.01 * j,
                                   host["masker"])
                save_model_pt(new, "masker",
                              checkpoint_paths(cfg)["masker"])
                srv.reload_checkpoints()

        rt = threading.Thread(target=reloader)
        rt.start()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        done.set()
        rt.join()
        assert not errors, errors
        assert srv.reloads >= 1
    finally:
        srv.batcher.close()


# -- reduced serve wire (--serve-wire u8; VERDICT r3 #4) --------------

@pytest.fixture(scope="module")
def u8_server(tmp_path_factory):
    cfg = parse_args(["--infer-batch", "16", "--serve-wait-ms", "30",
                      "--serve-wire", "u8",
                      "--binarymaskthreshold", "0.5",
                      "--model", str(tmp_path_factory.mktemp("srv8")
                                     / "norun")])
    srv = MaskServer(cfg)
    yield srv
    srv.batcher.close()


def test_u8_wire_raw_png_bit_identical(server, u8_server, rng):
    """Same seed -> same random-init weights; the raw PNG response
    must byte-equal the f32 server's (responses are 8-bit PNGs, so
    quantizing on device loses nothing)."""
    frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    body = _png(frame)
    assert u8_server.segment_bytes(body) == server.segment_bytes(body)


def test_u8_wire_thresholded_exact_at_server_threshold(server,
                                                       u8_server, rng):
    frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    body = _png(frame)
    a = server.segment_bytes(body, variant="thresholded",
                             threshold=0.5)
    b = u8_server.segment_bytes(body, variant="thresholded",
                                threshold=0.5)
    assert a == b


def test_u8_wire_rejects_custom_threshold_and_crf(u8_server, rng):
    frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    body = _png(frame)
    with pytest.raises(ValueError, match="f32 wire"):
        u8_server.segment_bytes(body, variant="thresholded",
                                threshold=0.25)
    with pytest.raises(ValueError, match="f32"):
        u8_server.segment_bytes(body, variant="crf")


def test_u8_wire_incompatible_with_crf_at_start(tmp_path):
    cfg = parse_args(["--serve-wire", "u8", "-crf",
                      "--model", str(tmp_path / "norun")])
    with pytest.raises(ValueError, match="crf"):
        MaskServer(cfg)
