"""Inference server: live HTTP round trip on a random port."""

import json
import os
import threading
import urllib.parse
import urllib.request

import numpy as np
import pytest

from tests.conftest import REFERENCE, needs_reference
from unmicst_tpu.io.tiff import TiffFile, imwrite
from unmicst_tpu.serve import ModelServer, make_handler

pytestmark = needs_reference


@pytest.fixture(scope="module")
def server_url():
    from http.server import ThreadingHTTPServer

    srv = ModelServer(
        model_root=os.path.join(REFERENCE, "models"), precision="float32"
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()
    httpd.server_close()


def test_healthz_and_models(server_url):
    with urllib.request.urlopen(server_url + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["devices"]
    with urllib.request.urlopen(server_url + "/models", timeout=30) as r:
        models = json.loads(r.read())
    assert models.get("nucleiDAPI") == "ready"


def test_infer_roundtrip(server_url, tmp_path, rng):
    raw = (rng.rand(100, 80) * 60000).astype(np.uint16)
    src = str(tmp_path / "in.tif")
    imwrite(src, raw, bigtiff=False)
    req = urllib.request.Request(
        server_url + "/infer?model=nucleiDAPI&channel=0",
        data=open(src, "rb").read(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        body = r.read()
        meta = json.loads(r.headers["X-UnMicst-Meta"])
    assert meta["classes"] == 3 and meta["shape"] == [100, 80]
    out = str(tmp_path / "out.tif")
    open(out, "wb").write(body)
    with TiffFile(out) as tf:
        assert len(tf.pages) == 3
        pages = [tf.read_page(k) for k in range(3)]
    total = sum(p.astype(int) for p in pages)
    assert np.abs(total - 255).max() <= 3  # probabilities sum to ~1


def test_serve_int8_precision(server_url, tmp_path, rng):
    """A --precision int8 server answers with maps distributionally close
    to the f32 server's (real legacy weights; the engine calibrates once
    on its first slide — core/quant.py)."""
    from http.server import ThreadingHTTPServer

    raw = (rng.rand(100, 80) * 60000).astype(np.uint16)
    src = str(tmp_path / "in8.tif")
    imwrite(src, raw, bigtiff=False)
    srv8 = ModelServer(
        model_root=os.path.join(REFERENCE, "models"), precision="int8"
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv8))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        outs = {}
        for label, url in [
            ("f32", server_url),
            ("int8", f"http://127.0.0.1:{httpd.server_address[1]}"),
        ]:
            req = urllib.request.Request(
                url + "/infer?model=nucleiDAPI&channel=0",
                data=open(src, "rb").read(), method="POST",
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                body = r.read()
            out = str(tmp_path / f"out_{label}.tif")
            open(out, "wb").write(body)
            with TiffFile(out) as tf:
                outs[label] = np.stack(
                    [tf.read_page(k).astype(int) for k in range(3)]
                )
    finally:
        httpd.shutdown()
        httpd.server_close()
    diff = np.abs(outs["int8"] - outs["f32"])
    assert diff.mean() < 6.0, diff.mean()
    dis = (outs["int8"].argmax(0) != outs["f32"].argmax(0)).mean()
    assert dis < 0.04, dis


def test_concurrent_requests(server_url, tmp_path, rng):
    """Two simultaneous inferences share one engine safely (cache lock)."""
    import concurrent.futures

    def one(seed):
        r = np.random.RandomState(seed)
        raw = (r.rand(64 + seed, 80) * 60000).astype(np.uint16)
        src = str(tmp_path / f"in{seed}.tif")
        imwrite(src, raw, bigtiff=False)
        req = urllib.request.Request(
            server_url + "/infer?model=nucleiDAPI&channel=0",
            data=open(src, "rb").read(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            meta = json.loads(resp.headers["X-UnMicst-Meta"])
            resp.read()
        return meta["shape"]

    with concurrent.futures.ThreadPoolExecutor(2) as ex:
        shapes = list(ex.map(one, [1, 2]))
    assert shapes == [[65, 80], [66, 80]]


def test_infer_unknown_model(server_url, tmp_path, rng):
    raw = (rng.rand(40, 40) * 60000).astype(np.uint16)
    src = str(tmp_path / "in.tif")
    imwrite(src, raw, bigtiff=False)
    req = urllib.request.Request(
        server_url + "/infer?model=doesNotExist",
        data=open(src, "rb").read(),
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 404


def test_oversized_body_rejected_413(tmp_path, rng):
    from http.server import ThreadingHTTPServer

    srv = ModelServer(
        model_root=os.path.join(REFERENCE, "models"), precision="float32",
        max_body_bytes=1000,
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/infer?model=nucleiDAPI",
            data=b"x" * 2000, method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 413
        # and zero-length bodies get 411
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/infer?model=nucleiDAPI",
            data=b"", method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 411
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_concurrent_inference_consistent(server_url, tmp_path, rng):
    """Four simultaneous POSTs (ThreadingHTTPServer + engine cache lock):
    every response equals the sequential answer."""
    raw = (rng.rand(96, 72) * 60000).astype(np.uint16)
    src = str(tmp_path / "c.tif")
    imwrite(src, raw, bigtiff=False)
    body = open(src, "rb").read()

    def post():
        req = urllib.request.Request(
            server_url + "/infer?model=nucleiDAPI&channel=0",
            data=body, method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.read()

    sequential = post()
    results = [None] * 4
    errors = []

    def worker(i):
        try:
            results[i] = post()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors
    assert all(r == sequential for r in results)


def test_bad_parameters_get_400(server_url):
    req = urllib.request.Request(
        server_url + "/infer?model=nucleiDAPI&channel=notanint",
        data=b"xx", method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_large_posts_stream(tmp_path, rng):
    """stream_above_px forces the bounded-memory path; response matches the
    whole-image path within 1 uint8 level."""
    srv_whole = ModelServer(
        model_root=os.path.join(REFERENCE, "models"), precision="float32"
    )
    srv_stream = ModelServer(
        model_root=os.path.join(REFERENCE, "models"), precision="float32",
        stream_above_px=1,
    )
    raw = (rng.rand(100, 80) * 60000).astype(np.uint16)
    src = str(tmp_path / "s.tif")
    imwrite(src, raw, bigtiff=False)
    a, meta_a = srv_whole.infer_tiff_path(src, "nucleiDAPI", 0, True, -1)
    b, meta_b = srv_stream.infer_tiff_path(src, "nucleiDAPI", 0, True, -1)
    assert meta_a["shape"] == meta_b["shape"] == [100, 80]
    pa = str(tmp_path / "a.tif")
    pb = str(tmp_path / "b.tif")
    open(pa, "wb").write(a)
    open(pb, "wb").write(b)
    from unmicst_tpu.io.tiff import imread, num_pages

    assert num_pages(pa) == num_pages(pb) == 3
    for k in range(3):
        x = imread(pa, k).astype(int)
        y = imread(pb, k).astype(int)
        assert np.abs(x - y).max() <= 1


def test_serve_scale_param(server_url, tmp_path, rng):
    """?scale=0.5 resizes on the device path, returns raw-resolution maps,
    agrees with the whole-path host chain within 1 level; the streaming
    branch (virtual resized source + upscale at encode) matches the
    whole branch; bad scale is a 400."""
    from unmicst_tpu.io.tiff import imread, num_pages

    raw = (rng.rand(110, 84) * 60000).astype(np.uint16)
    src = str(tmp_path / "s.tif")
    imwrite(src, raw, bigtiff=False)
    body = open(src, "rb").read()
    req = urllib.request.Request(
        server_url + "/infer?model=nucleiDAPI&channel=0&scale=0.5",
        data=body, method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        blob = r.read()
    p = str(tmp_path / "o.tif")
    open(p, "wb").write(blob)
    assert num_pages(p) == 3
    assert imread(p, 0).shape == (110, 84)  # raw resolution back

    # streaming branch with the same scale == whole branch
    srv_stream = ModelServer(
        model_root=os.path.join(REFERENCE, "models"), precision="float32",
        stream_above_px=1,
    )
    b2, meta2 = srv_stream.infer_tiff_path(
        src, "nucleiDAPI", 0, True, -1, scale=0.5
    )
    assert meta2["shape"] == [110, 84]
    p2 = str(tmp_path / "o2.tif")
    open(p2, "wb").write(b2)
    for k in range(3):
        d = np.abs(imread(p, k).astype(int) - imread(p2, k).astype(int))
        assert d.max() <= 1 and (d > 0).mean() < 0.02

    req = urllib.request.Request(
        server_url + "/infer?model=nucleiDAPI&channel=0&scale=0",
        data=body, method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_serve_compress_bool_compat_and_scale_bound(tmp_path, rng):
    """Programmatic compress=True (pre-codec-string API) still means
    deflate; an upscale whose scaled pixel count exceeds max_scaled_px
    is rejected before any allocation."""
    from unmicst_tpu.io.tiff import TiffFile

    srv = ModelServer(
        model_root=os.path.join(REFERENCE, "models"), precision="float32"
    )
    raw = (rng.rand(80, 60) * 60000).astype(np.uint16)
    src = str(tmp_path / "s.tif")
    imwrite(src, raw, bigtiff=False)
    body, _ = srv.infer_tiff_path(src, "nucleiDAPI", 0, True, -1,
                                  compress=True)
    p = str(tmp_path / "o.tif")
    open(p, "wb").write(body)
    with TiffFile(p) as tf:
        assert tf.pages[0].compression == 8  # deflate
    srv.max_scaled_px = 100 * 75 - 1  # 80*60 at scale 1.25 = 100x75
    with pytest.raises(ValueError, match="scaled pixel count"):
        srv.infer_tiff_path(src, "nucleiDAPI", 0, True, -1, scale=1.25)
    # the bound applies to UPSCALES only: the same slide over the bound
    # at scale <= 1 must still be served (downscales shrink the work)
    srv.max_scaled_px = 80 * 60 - 1
    body2, _ = srv.infer_tiff_path(src, "nucleiDAPI", 0, True, -1,
                                   scale=0.5)
    assert body2[:2] == b"II"


def test_serve_pyramid_param(server_url, tmp_path, rng):
    """?pyramid=1 returns tiled SubIFD-pyramid pages with identical
    full-res pixels to the flat response."""
    from unmicst_tpu.io.tiff import TiffFile

    raw = (rng.rand(600, 560) * 60000).astype(np.uint16)
    src = str(tmp_path / "s.tif")
    imwrite(src, raw, bigtiff=False)
    body = open(src, "rb").read()
    blobs = {}
    for q in ("", "&pyramid=1"):
        req = urllib.request.Request(
            server_url + "/infer?model=nucleiDAPI&channel=0" + q,
            data=body, method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            blobs[q] = r.read()
    pa, pb = str(tmp_path / "flat.tif"), str(tmp_path / "pyr.tif")
    open(pa, "wb").write(blobs[""])
    open(pb, "wb").write(blobs["&pyramid=1"])
    with TiffFile(pa) as a, TiffFile(pb) as b:
        assert len(a.pages) == len(b.pages) == 3
        for k in range(3):
            assert b.pages[k].tiled and b.pages[k].subifds is not None
            np.testing.assert_array_equal(a.read_page(k), b.read_page(k))
            assert b.read_subifd(k, 0).shape == (300, 280)


def test_infer_czi_and_nd2_bodies(server_url, tmp_path, rng):
    """POST bodies are sniffed by magic bytes: CZI and ND2 containers work
    end-to-end and match the TIFF result for identical pixels."""
    from tests.test_slides_czi_nd2 import write_czi, write_nd2

    plane = (rng.rand(70, 90) * 60000).astype(np.uint16)
    paths = {"tif": str(tmp_path / "a.tif"),
             "czi": str(tmp_path / "a.czi"),
             "nd2": str(tmp_path / "a.nd2")}
    imwrite(paths["tif"], plane, bigtiff=False)
    write_czi(paths["czi"], [plane])
    write_nd2(paths["nd2"], [plane[:, :, None]])
    bodies = {}
    for fmt, path in paths.items():
        req = urllib.request.Request(
            server_url + "/infer?model=nucleiDAPI&channel=0",
            data=open(path, "rb").read(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            bodies[fmt] = r.read()
            meta = json.loads(r.headers["X-UnMicst-Meta"])
        assert meta["shape"] == [70, 90], fmt
    assert bodies["czi"] == bodies["tif"]
    assert bodies["nd2"] == bodies["tif"]


def test_infer_garbage_body_400(server_url):
    req = urllib.request.Request(
        server_url + "/infer?model=nucleiDAPI&channel=0",
        data=b"\x00" * 256, method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400


def test_infer_missing_channel_400(server_url, tmp_path, rng):
    raw = (rng.rand(40, 40) * 60000).astype(np.uint16)
    src = str(tmp_path / "c.tif")
    imwrite(src, raw, bigtiff=False)
    req = urllib.request.Request(
        server_url + "/infer?model=nucleiDAPI&channel=5",
        data=open(src, "rb").read(), method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400


def test_serve_duo_two_channel(tmp_path, rng):
    """channel=0,1 routes a two-channel (duo) read through
    infer_slide_stack; channel count mismatches get a clean error."""
    from tests.test_cli_variants import _make_model_dir
    from unmicst_tpu.core.hp import HParams

    zoo = str(tmp_path / "zoo")
    os.makedirs(zoo)
    _make_model_dir(
        zoo, "duoTest",
        HParams(im_size=32, n_channels=2, n_classes=3, n_out0=4, ks=3,
                n_layers=2),
        "duo",
    )
    srv = ModelServer(model_root=zoo, precision="float32")
    src = str(tmp_path / "in.tif")
    for i in range(3):
        imwrite(src, (rng.rand(60, 72) * 60000).astype(np.uint16),
                bigtiff=False, append=i > 0)
    body, meta = srv.infer_tiff_path(src, "duoTest", [0, 2], True, -1)
    assert meta["shape"] == [60, 72] and meta["classes"] == 3
    # order matters: distinct planes feed distinct net channels
    body2, _ = srv.infer_tiff_path(src, "duoTest", [2, 0], True, -1)
    assert body != body2
    # 3 channels into a 2-channel model -> ValueError (handler maps to 400)
    with pytest.raises(ValueError):
        srv.infer_tiff_path(src, "duoTest", [0, 1, 2], True, -1)


def test_serve_compress_query(server_url, tmp_path, rng):
    """?compress=1 returns a Deflate-paged TIFF decoding to the same maps."""
    yy, xx = np.mgrid[0:90, 0:70]
    raw = ((yy * xx) % 50000).astype(np.uint16)
    src = str(tmp_path / "in.tif")
    imwrite(src, raw, bigtiff=False)
    bodies = {}
    for q in ("", "&compress=1", "&compress=zstd"):
        req = urllib.request.Request(
            server_url + "/infer?model=nucleiDAPI&channel=0" + q,
            data=open(src, "rb").read(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            bodies[q] = r.read()
    assert len(bodies["&compress=1"]) < len(bodies[""])
    assert len(bodies["&compress=zstd"]) < len(bodies[""])
    for name, blob in bodies.items():
        p = str(tmp_path / f"o{len(name)}.tif")
        open(p, "wb").write(blob)
    with TiffFile(str(tmp_path / "o0.tif")) as a, \
            TiffFile(str(tmp_path / "o11.tif")) as b, \
            TiffFile(str(tmp_path / "o14.tif")) as c:
        assert b.pages[0].compression == 8
        assert c.pages[0].compression == 50000
        for k in range(3):
            np.testing.assert_array_equal(a.read_page(k), b.read_page(k))
            np.testing.assert_array_equal(a.read_page(k), c.read_page(k))


def test_empty_channel_descriptive_400(server_url):
    # parse_qs drops blank values, so the empty-list case is "channel=,"
    for query in ("channel=,", "channel=0,1,2"):
        req = urllib.request.Request(
            server_url + "/infer?model=nucleiDAPI&" + query,
            data=b"xx", method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        body = json.loads(ei.value.read().decode())
        assert "channel" in body["error"]  # descriptive, not an IndexError


def test_busy_backpressure_503(tmp_path, rng):
    """max_inflight=0 (test hook: always busy) -> 503 + Retry-After and
    the rejection is counted; /stats reflects request accounting."""
    from http.server import ThreadingHTTPServer

    srv = ModelServer(
        model_root=os.path.join(REFERENCE, "models"),
        max_inflight=0, queue_timeout_s=0.1,
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/infer?model=nucleiDAPI",
            data=b"xx", method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 503
        assert ei.value.headers.get("Retry-After")
        body = json.loads(ei.value.read().decode())
        assert "busy" in body["error"]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 1
        assert stats["busy_rejected"] == 1
        assert stats["ok"] == 0
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_stats_counts_success_and_errors(server_url, tmp_path, rng):
    with urllib.request.urlopen(server_url + "/stats", timeout=30) as r:
        before = json.loads(r.read())
    # one success
    img = (rng.rand(96, 112) * 60000).astype(np.uint16)
    p = str(tmp_path / "s.tif")
    imwrite(p, img, bigtiff=False)
    req = urllib.request.Request(
        server_url + "/infer?model=nucleiDAPI&channel=0",
        data=open(p, "rb").read(), method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        r.read()
    # one client error (garbage body)
    bad = urllib.request.Request(
        server_url + "/infer?model=nucleiDAPI", data=b"zz", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(bad, timeout=30)
    with urllib.request.urlopen(server_url + "/stats", timeout=30) as r:
        after = json.loads(r.read())
    assert after["ok"] == before["ok"] + 1
    assert after["client_error"] == before["client_error"] + 1
    assert after["px_processed"] >= before["px_processed"] + 96 * 112
    assert after["by_model"].get("nucleiDAPI", 0) >= 1
    assert after["uptime_s"] >= 0


def test_graceful_drain_on_sigterm(tmp_path):
    """A real server process drains on SIGTERM: stops accepting, exits 0
    with the drain message (the production shutdown path)."""
    import signal
    import subprocess
    import sys
    import time as _time

    # env-var platform forcing is pre-empted by sitecustomize on this
    # host (CLAUDE.md): force CPU via jax.config BEFORE importing serve
    stub = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from unmicst_tpu import serve;"
        "raise SystemExit(serve.main(['--host','127.0.0.1','--port','0']))"
    )
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", stub],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # the serve banner prints the bound port
        lines = []
        line = ""
        deadline = _time.time() + 120
        while _time.time() < deadline:
            line = proc.stdout.readline()
            lines.append(line)
            if "serving on" in line:
                break
            if line == "" and proc.poll() is not None:
                break  # child died at startup: don't spin on EOF
        assert "serving on" in line, "".join(lines)
        port = int(line.rsplit(":", 1)[1])
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["status"] == "ok"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
        assert proc.returncode == 0, out
        assert "drain" in out
    finally:
        if proc.poll() is None:
            proc.kill()


def test_drain_completes_inflight_request(tmp_path, rng):
    """SIGTERM while a request is being served: the in-flight response
    completes (200, valid body) and the process then exits 0."""
    import signal
    import subprocess
    import sys
    import time as _time

    stub = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from unmicst_tpu import serve;"
        "raise SystemExit(serve.main(['--host','127.0.0.1','--port','0',"
        f"'--modelRoot','{os.path.join(REFERENCE, 'models')}']))"
    )
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", stub],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        lines, line = [], ""
        deadline = _time.time() + 120
        while _time.time() < deadline:
            line = proc.stdout.readline()
            lines.append(line)
            if "serving on" in line:
                break
            if line == "" and proc.poll() is not None:
                break
        assert "serving on" in line, "".join(lines)
        port = int(line.rsplit(":", 1)[1])

        img = (rng.rand(640, 640) * 60000).astype(np.uint16)
        p = str(tmp_path / "d.tif")
        imwrite(p, img, bigtiff=False)
        result = {}

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/infer?model=nucleiDAPI",
                data=open(p, "rb").read(), method="POST",
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                result["code"] = r.status
                result["len"] = len(r.read())

        t = threading.Thread(target=post)
        t.start()
        _time.sleep(1.0)  # request is in flight (CPU inference >> 1 s)
        proc.send_signal(signal.SIGTERM)
        t.join(timeout=300)
        out, _ = proc.communicate(timeout=120)
        assert result.get("code") == 200 and result.get("len", 0) > 0, (
            result, out[-1000:],
        )
        assert proc.returncode == 0, out[-1000:]
        assert "drain" in out
    finally:
        if proc.poll() is None:
            proc.kill()


def test_model_param_path_traversal_rejected(server_url):
    for bad in ("/etc", "../models/nucleiDAPI", "a/b"):
        req = urllib.request.Request(
            server_url + "/infer?model=" + urllib.parse.quote(bad, safe=""),
            data=b"xx", method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        assert "plain model name" in json.loads(ei.value.read().decode())["error"]


def test_strict_bool_and_outlier_validation(server_url, tmp_path, rng):
    img = (rng.rand(40, 40) * 60000).astype(np.uint16)
    p = str(tmp_path / "b.tif")
    imwrite(p, img, bigtiff=False)
    body = open(p, "rb").read()
    for query in ("rescale=false", "rescale=no"):
        # these must WORK and actually disable rescaling (strict parse)
        req = urllib.request.Request(
            server_url + "/infer?model=nucleiDAPI&" + query,
            data=body, method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            r.read()
    for query in ("rescale=maybe", "compress=gzip", "outlier=150",
                  "outlier=nan"):
        req = urllib.request.Request(
            server_url + "/infer?model=nucleiDAPI&" + query,
            data=body, method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400, query


def test_hostile_bodies_never_500(server_url, tmp_path, rng):
    """Mutated/garbage container bodies through the LIVE HTTP stack must
    come back as 4xx (the parser contract mapped by the handler), never
    a 500 or a dead server — binds the fuzz-hardened parse chain to the
    production surface."""
    import urllib.error

    from unmicst_tpu.io.tiff import imwrite as _imwrite

    base = str(tmp_path / "b.tif")
    _imwrite(base, (rng.rand(40, 50) * 255).astype(np.uint8))
    valid = open(base, "rb").read()
    local = np.random.RandomState(99)
    bodies = [b"", b"garbage", b"II*\0" + bytes(local.bytes(64))]
    for _ in range(12):
        b = bytearray(valid)
        for _ in range(local.randint(1, 8)):
            b[local.randint(0, len(b))] ^= 1 << local.randint(0, 8)
        bodies.append(bytes(b))
    statuses = []
    for body in bodies:
        req = urllib.request.Request(
            server_url + "/infer?model=nucleiDAPI&channel=0", data=body,
            headers={"Content-Type": "application/octet-stream"},
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                statuses.append(r.status)
        except urllib.error.HTTPError as e:
            statuses.append(e.code)
    assert all(s in (200, 400, 404, 411, 413) for s in statuses), statuses
    # server is still alive and healthy afterwards
    with urllib.request.urlopen(server_url + "/healthz", timeout=30) as r:
        assert r.status == 200


def test_roi_inference(server_url, tmp_path, rng):
    """roi=r0,c0,h,w infers only the window.  A band that reaches row 0
    (r0 < one tile) shares the full run's tile-grid origin, so the crop
    is bit-identical; out-of-bounds ROIs are 400s."""
    import urllib.error

    img = (rng.rand(200, 160) * 60000).astype(np.uint16)
    p = str(tmp_path / "roi.tif")
    imwrite(p, img)
    body = open(p, "rb").read()

    def post(query):
        req = urllib.request.Request(
            server_url + "/infer?" + query, data=body,
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=180) as r:
            out = r.read()
        dst = tmp_path / "out.tif"
        dst.write_bytes(out)
        with TiffFile(str(dst)) as tf:
            return np.stack([tf.read_page(i)
                             for i in range(len(tf.pages))])

    full = post("model=nucleiDAPI&channel=0")
    r0, c0, h, w = 40, 16, 64, 96
    roi = post(f"model=nucleiDAPI&channel=0&roi={r0},{c0},{h},{w}")
    assert roi.shape == (full.shape[0], h, w)
    np.testing.assert_array_equal(
        roi, full[:, r0:r0 + h, c0:c0 + w]
    )
    # out-of-bounds / malformed ROIs are client errors
    for bad in ("199,0,64,64", "0,0,0,4", "0,0,4", "a,b,c,d"):
        req = urllib.request.Request(
            server_url + f"/infer?model=nucleiDAPI&channel=0&roi={bad}",
            data=body,
            headers={"Content-Type": "application/octet-stream"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400


def test_classes_subset(server_url, tmp_path, rng):
    """classes= returns only the requested probability-map pages (same
    reversed page order), on the whole path AND on cached-slide ROI
    pans (where the discard happens on device); bad indices are 400s."""
    import urllib.error

    img = (rng.rand(160, 140) * 60000).astype(np.uint16)
    p = str(tmp_path / "cls.tif")
    imwrite(p, img)
    body = open(p, "rb").read()

    def post(query, data=body):
        req = urllib.request.Request(
            server_url + "/infer?" + query, data=data,
            headers={"Content-Type": "application/octet-stream"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=180) as r:
            out = r.read()
            meta = json.loads(r.headers["X-UnMicst-Meta"])
        dst = tmp_path / "cls_out.tif"
        dst.write_bytes(out)
        with TiffFile(str(dst)) as tf:
            return np.stack([tf.read_page(i)
                             for i in range(len(tf.pages))]), meta

    full, _ = post("model=nucleiDAPI&channel=0")
    # page order is reversed class order: page0 = class 2
    one, meta = post("model=nucleiDAPI&channel=0&classes=2")
    assert one.shape[0] == 1 and meta["classes"] == 1
    assert meta["class_indices"] == [2]
    np.testing.assert_array_equal(one[0], full[0])
    two, _ = post("model=nucleiDAPI&channel=0&classes=1,2")
    np.testing.assert_array_equal(two, full[:2])
    # cached-slide pan with classes: device-trimmed AND device-subset
    sreq = urllib.request.Request(
        server_url + "/slides", data=body, method="POST",
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(sreq, timeout=180) as r:
        sid = json.loads(r.read())["slide_id"]
    q = ("model=nucleiDAPI&channel=0&range=0,65535&classes=2"
         f"&slide={sid}&roi=40,16,64,96")
    pan, meta = post(q, data=None)
    fullr, _ = post("model=nucleiDAPI&channel=0&range=0,65535"
                    "&roi=40,16,64,96")
    assert pan.shape == (1, 64, 96) and meta["class_indices"] == [2]
    np.testing.assert_array_equal(pan[0], fullr[0])
    # out-of-range / malformed class lists are client errors (a BLANK
    # classes= is dropped by parse_qs -> behaves as absent; "," is the
    # present-but-empty form)
    for bad in ("9", "x", ","):
        req = urllib.request.Request(
            server_url + "/infer?model=nucleiDAPI&channel=0"
            f"&classes={bad}",
            data=body,
            headers={"Content-Type": "application/octet-stream"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400


def test_classes_subset_streamed(tmp_path, rng):
    """classes= on a slide above the streaming bound: the stripe program
    subsets ON DEVICE (the subset is part of the compiled-program key),
    so the D2H and the response both carry only the requested pages."""
    root = os.path.join(REFERENCE, "models")
    srv = ModelServer(
        model_root=root, precision="float32", stream_above_px=1
    )
    img = (rng.rand(120, 100) * 60000).astype(np.uint16)
    p = str(tmp_path / "big.tif")
    imwrite(p, img)
    full, _ = srv.infer_tiff_path(p, "nucleiDAPI", 0, True, -1)
    sub, meta = srv.infer_tiff_path(p, "nucleiDAPI", 0, True, -1,
                                    classes=(2,))
    dst = tmp_path / "s.tif"
    dst.write_bytes(sub)
    dst2 = tmp_path / "f.tif"
    dst2.write_bytes(full)
    with TiffFile(str(dst)) as tf, TiffFile(str(dst2)) as tf2:
        assert len(tf.pages) == 1 and len(tf2.pages) == 3
        np.testing.assert_array_equal(tf.read_page(0), tf2.read_page(0))
    assert meta["class_indices"] == [2]
    # device-side proof: the streamed engine compiled a program whose
    # key carries the classes tuple (host-side dropping would reuse the
    # classes=None program)
    keys = list(srv.engine("nucleiDAPI", "stream")._compiled._entries)
    assert any(k[-1] == (2,) for k in keys), keys
    with pytest.raises(ValueError, match="out of range"):
        srv.infer_tiff_path(p, "nucleiDAPI", 0, True, -1, classes=(7,))


def test_classes_subset_streamed_stack(tmp_path, rng):
    """classes= on a streamed TWO-channel (duo) slide rides
    infer_stack's device-side subset, same byte contract as solo."""
    from tests.test_cli_variants import _make_model_dir
    from unmicst_tpu.core.hp import HParams

    zoo = str(tmp_path / "zoo")
    os.makedirs(zoo)
    _make_model_dir(
        zoo, "duoTest",
        HParams(im_size=32, n_channels=2, n_classes=3, n_out0=4, ks=3,
                n_layers=2),
        "duo",
    )
    srv = ModelServer(model_root=zoo, precision="float32",
                      stream_above_px=1)
    p = str(tmp_path / "big2.tif")
    for i in range(2):
        imwrite(p, (rng.rand(90, 110) * 60000).astype(np.uint16),
                bigtiff=False, append=i > 0)
    full, _ = srv.infer_tiff_path(p, "duoTest", [0, 1], True, -1)
    sub, meta = srv.infer_tiff_path(p, "duoTest", [0, 1], True, -1,
                                    classes=(0, 2))
    assert meta["class_indices"] == [0, 2]
    dst, dst2 = tmp_path / "s2.tif", tmp_path / "f2.tif"
    dst.write_bytes(sub)
    dst2.write_bytes(full)
    with TiffFile(str(dst)) as tf, TiffFile(str(dst2)) as tf2:
        assert len(tf.pages) == 2 and len(tf2.pages) == 3
        # page order contract: reversed request order -> classes (0, 2)
        # serve pages [2, 0]; the full run's 3 pages are classes [2,1,0]
        np.testing.assert_array_equal(tf.read_page(0), tf2.read_page(0))
        np.testing.assert_array_equal(tf.read_page(1), tf2.read_page(2))
    keys = list(srv.engine("duoTest", "stream")._compiled._entries)
    assert any(k[-1] == (0, 2) for k in keys), keys


def test_serve_preload(monkeypatch):
    """serve(preload=[...]) constructs the named engines BEFORE the
    listening socket exists; a bad name fails the deploy loudly."""
    import signal

    import unmicst_tpu.serve as serve_mod

    # serve() installs SIGINT/SIGTERM drain handlers in this (main)
    # thread — restore them so the rest of the suite stays Ctrl-C-able
    old = {s: signal.getsignal(s)
           for s in (signal.SIGINT, signal.SIGTERM)}
    try:
        _run_preload_checks(serve_mod, monkeypatch)
    finally:
        for s, h in old.items():
            signal.signal(s, h)


def _run_preload_checks(serve_mod, monkeypatch):

    captured = {}
    real_make = serve_mod.make_handler

    def capturing_make_handler(server):
        # called at ThreadingHTTPServer construction time — preload
        # must already have populated the engine registry by now
        captured["engines_at_bind"] = dict(server._engines)
        return real_make(server)

    class StubHTTPD:
        daemon_threads = False

        def __init__(self, addr, handler):
            self.server_address = (addr[0], 1)

        def serve_forever(self):
            pass

        def server_close(self):
            pass

    monkeypatch.setattr(serve_mod, "make_handler", capturing_make_handler)
    monkeypatch.setattr(serve_mod, "ThreadingHTTPServer", StubHTTPD)
    serve_mod.serve("127.0.0.1", 0,
                    model_root=os.path.join(REFERENCE, "models"),
                    precision="float32", preload=["nucleiDAPI"])
    ent = captured["engines_at_bind"][("nucleiDAPI", "float32", "whole")]
    assert ent["value"] is not None and ent["error"] is None

    with pytest.raises(FileNotFoundError, match="doesNotExist"):
        serve_mod.serve("127.0.0.1", 0,
                        model_root=os.path.join(REFERENCE, "models"),
                        precision="float32", preload=["doesNotExist"])


def test_serve_use_pyramid_input(tmp_path, rng, monkeypatch):
    """usePyramid=1 at scale <= 0.5 serves from the stored SubIFD level
    (full-res plane never decoded), == the level fed directly at the
    residual scale upscaled to full dims; flat inputs fall through."""
    import unmicst_tpu.io.tiff as tiff_mod
    from unmicst_tpu.io import preprocess as pp
    from unmicst_tpu.io.tiff import TiffWriter

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    img = (rng.rand(256, 384) * 60000).astype(np.uint16)
    src = str(tmp_path / "pyr.tif")
    with TiffWriter(src, bigtiff=False) as tw:
        assert tw.write_pyramid(img, tile=(64, 64), min_size=64) == 2
    with TiffFile(src) as tf:
        lvl0 = tf.read_subifd(0, 0)
    lv = str(tmp_path / "lvl.tif")
    with TiffWriter(lv, bigtiff=False) as tw:
        tw.write(lvl0)

    srv = ModelServer(model_root=os.path.join(repo, "models"),
                      precision="float32")
    reads = []
    orig = tiff_mod.TiffFile.read_page

    def counting(self, i):
        reads.append(self.path)
        return orig(self, i)

    monkeypatch.setattr(tiff_mod.TiffFile, "read_page", counting)
    body, meta = srv.infer_tiff_path(src, "blobDemo", 0, True, -1,
                                     scale=0.5, use_pyramid=True)
    assert src not in reads  # decode saving: full-res page untouched
    assert meta["shape"] == [256, 384]  # full-res output contract
    oracle, _ = srv.infer_tiff_path(lv, "blobDemo", 0, True, -1)

    def pages(b):
        dst = tmp_path / "r.tif"
        dst.write_bytes(b)
        with TiffFile(str(dst)) as tf:
            return [tf.read_page(k) for k in range(len(tf.pages))]

    for a, b in zip(pages(body), pages(oracle)):
        np.testing.assert_array_equal(a, pp.upscale_pm(b, img.shape))

    # flat input: flag falls through to the normal scaled run
    flat = str(tmp_path / "flat.tif")
    with TiffWriter(flat, bigtiff=False) as tw:
        tw.write(img)
    with_flag, _ = srv.infer_tiff_path(flat, "blobDemo", 0, True, -1,
                                       scale=0.5, use_pyramid=True)
    without, _ = srv.infer_tiff_path(flat, "blobDemo", 0, True, -1,
                                     scale=0.5)
    assert with_flag == without


def test_probe_range(server_url, tmp_path, rng):
    """probe=range returns global per-channel (lo, hi) — exact min/max
    and exact percentile — with no inference."""
    img = (rng.rand(300, 120) * 20000).astype(np.uint16)
    img[5, 7] = 60000
    p = str(tmp_path / "probe.tif")
    imwrite(p, img)
    body = open(p, "rb").read()

    def probe(query):
        req = urllib.request.Request(
            server_url + "/infer?" + query, data=body,
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    res = probe("probe=range&channel=0")
    assert res["shape"] == [300, 120]
    (lo, hi), = res["range"]
    assert lo == float(img.min()) and hi == 60000.0
    res99 = probe("probe=range&channel=0&outlier=99")
    assert res99["range"][0][1] == pytest.approx(
        float(np.percentile(img, 99))
    )


def test_roi_with_pinned_range(server_url, tmp_path, rng):
    """An ROI whose context band misses the slide's bright region matches
    the full run bit-for-bit once range= pins the global stats — and
    drifts without it.  (Band chosen grid-aligned: r0 - pad is a
    sub-stride multiple of the 128/16 nucleiDAPI geometry.)"""
    img = (rng.rand(1200, 160) * 20000).astype(np.uint16)
    img[:40] = 60000  # bright rows OUTSIDE the roi's (snapped) band
    p = str(tmp_path / "roipin.tif")
    imwrite(p, img)
    body = open(p, "rb").read()

    def post(query):
        req = urllib.request.Request(
            server_url + "/infer?" + query, data=body,
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = r.read()
            meta = json.loads(r.headers["X-UnMicst-Meta"])
        dst = tmp_path / "roipin_out.tif"
        dst.write_bytes(out)
        with TiffFile(str(dst)) as tf:
            return np.stack(
                [tf.read_page(i) for i in range(len(tf.pages))]
            ), meta

    rng_q = f"range={float(img.min())},{float(img.max())}"
    full, meta = post(f"model=nucleiDAPI&channel=0&{rng_q}")
    assert meta["in_range"] == [[float(img.min()), float(img.max())]]
    r0, c0, h, w = 700, 0, 64, 160
    roi_q = f"roi={r0},{c0},{h},{w}"
    pinned, _ = post(f"model=nucleiDAPI&channel=0&{roi_q}&{rng_q}")
    np.testing.assert_array_equal(
        pinned, full[:, r0:r0 + h, c0:c0 + w]
    )
    unpinned, _ = post(f"model=nucleiDAPI&channel=0&{roi_q}")
    assert np.abs(
        unpinned.astype(int) - pinned.astype(int)
    ).max() > 2


def test_serve_scale_with_pinned_range_streamed(tmp_path, rng):
    """range= composes with scale= on the STREAMING branch (advisor r4
    high): raw-unit pins convert into the unit-scale resampled source's
    units; streamed == whole branch, and the maps are non-constant (the
    bug clipped every pixel to lo)."""
    from unmicst_tpu.io.tiff import imread

    raw = (rng.rand(110, 84) * 60000).astype(np.uint16)
    src = str(tmp_path / "s.tif")
    imwrite(src, raw, bigtiff=False)
    pin = [(float(raw.min()), float(raw.max()))]
    root = os.path.join(REFERENCE, "models")
    srv_whole = ModelServer(model_root=root, precision="float32")
    a, _ = srv_whole.infer_tiff_path(
        src, "nucleiDAPI", 0, True, -1, scale=0.5, in_range=pin
    )
    srv_stream = ModelServer(
        model_root=root, precision="float32", stream_above_px=1
    )
    b, _ = srv_stream.infer_tiff_path(
        src, "nucleiDAPI", 0, True, -1, scale=0.5, in_range=pin
    )
    pa, pb = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
    open(pa, "wb").write(a)
    open(pb, "wb").write(b)
    for k in range(3):
        x = imread(pa, k).astype(int)
        y = imread(pb, k).astype(int)
        assert np.abs(x - y).max() <= 2
        assert y.min() != y.max()


def test_range_param_validation(server_url, tmp_path, rng):
    import urllib.error

    img = (rng.rand(64, 64) * 60000).astype(np.uint16)
    p = str(tmp_path / "rbad.tif")
    imwrite(p, img)
    body = open(p, "rb").read()
    for bad in ("range=5", "range=9,9", "range=a,b", "range=0,nan",
                "range=0,100&rescale=0", "probe=minmax"):
        req = urllib.request.Request(
            server_url + f"/infer?model=nucleiDAPI&channel=0&{bad}",
            data=body,
            headers={"Content-Type": "application/octet-stream"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400, bad


def test_channel_name_selection(server_url, tmp_path, rng):
    """channel_name= resolves OME Channel Names (z-stack layout: a real
    name->plane mapping); equals the index request bit-for-bit; unknown
    names and non-OME bodies are 400s listing the problem."""
    import urllib.error

    from unmicst_tpu.io.tiff import TiffWriter

    planes = [
        (rng.rand(96, 80) * 60000).astype(np.uint16) for _ in range(4)
    ]
    xml = (
        '<?xml version="1.0"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0"><Pixels ID="Pixels:0" DimensionOrder="XYZCT" '
        'SizeC="2" SizeZ="2" SizeT="1" SizeX="80" SizeY="96" Type="uint16">'
        '<Channel ID="Channel:0:0" Name="DAPI"/>'
        '<Channel ID="Channel:0:1" Name="Lamin"/>'
        "</Pixels></Image></OME>"
    )
    p = str(tmp_path / "named_serve.ome.tif")
    with TiffWriter(p, bigtiff=False) as tw:
        for i, pl in enumerate(planes):
            tw.write(pl, description=xml if i == 0 else None)
    body = open(p, "rb").read()

    def post(query, expect_json=False):
        req = urllib.request.Request(
            server_url + "/infer?" + query, data=body,
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=180) as r:
            return json.loads(r.read()) if expect_json else r.read()

    by_idx = post("model=nucleiDAPI&channel=1")
    by_name = post("model=nucleiDAPI&channel_name=Lamin")
    assert by_idx == by_name  # byte-identical TIFF responses
    # probe=range honors names and reports the resolved index
    res = post("probe=range&channel_name=Lamin", expect_json=True)
    assert res["channels"] == [1]
    # z-stack: channel 1 = pages 2..3; stats come from page 2
    assert res["range"] == [
        [float(planes[2].min()), float(planes[2].max())]
    ]
    # unknown name (400 lists the available channels); >2 names (400);
    # bare `channel_name=` is dropped by parse_qs like `channel=` is —
    # the index default applies (the server's existing convention)
    for bad in ("channel_name=CD45",
                "channel_name=DAPI&channel_name=Lamin&channel_name=DAPI"):
        req = urllib.request.Request(
            server_url + f"/infer?model=nucleiDAPI&{bad}", data=body,
            headers={"Content-Type": "application/octet-stream"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400, bad


def test_roi_column_clip_wide_slide(server_url, tmp_path, rng):
    """The ROI band is clipped in BOTH axes: a small window of a very
    wide slide must infer only ~(h+2t)x(w+2t) pixels — not a full-width
    band — so it passes the windowed bound that a full-width band of
    the same slide would exceed, and (grid-aligned, range pinned) stays
    bit-identical to the full-run crop."""
    img = (rng.rand(480, 4000) * 20000).astype(np.uint16)
    img[:, :40] = 60000  # bright columns OUTSIDE the clipped band
    p = str(tmp_path / "wide.tif")
    imwrite(p, img)
    body = open(p, "rb").read()

    def post(query, n=0):
        req = urllib.request.Request(
            server_url + "/infer?" + query, data=body,
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = r.read()
        dst = tmp_path / f"wide_out{n}.tif"
        dst.write_bytes(out)
        with TiffFile(str(dst)) as tf:
            return np.stack(
                [tf.read_page(i) for i in range(len(tf.pages))]
            )

    rng_q = f"range={float(img.min())},{float(img.max())}"
    full = post(f"model=nucleiDAPI&channel=0&{rng_q}", 0)
    # r0-pad and c0-pad both land on sub-stride (96) multiples of the
    # nucleiDAPI 128/16 geometry -> the clipped band shares the grid
    r0, c0, h, w = 224, 1280, 96, 96
    roi = post(f"model=nucleiDAPI&channel=0&roi={r0},{c0},{h},{w}&{rng_q}", 1)
    np.testing.assert_array_equal(roi, full[:, r0:r0 + h, c0:c0 + w])


def test_slide_cache_roundtrip(server_url, tmp_path, rng):
    """POST /slides then body-less slide= requests: identical response
    to the body request; re-upload dedups to the same id; unknown ids
    404; body+slide together 400."""
    import urllib.error

    img = (rng.rand(200, 160) * 60000).astype(np.uint16)
    p = str(tmp_path / "cache.tif")
    imwrite(p, img)
    body = open(p, "rb").read()

    def post(path_q, data):
        req = urllib.request.Request(
            server_url + path_q, data=data, method="POST",
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.read(), dict(r.headers)

    up1, _ = post("/slides", body)
    sid = json.loads(up1)["slide_id"]
    assert not json.loads(up1)["deduplicated"]
    up2, _ = post("/slides", body)
    assert json.loads(up2)["slide_id"] == sid
    assert json.loads(up2)["deduplicated"]

    with_body, _ = post("/infer?model=nucleiDAPI&channel=0", body)
    cached, _ = post(f"/infer?model=nucleiDAPI&channel=0&slide={sid}",
                     None)
    assert cached == with_body  # byte-identical TIFF
    # roi + probe work against the cached slide too
    roi, _ = post(
        f"/infer?model=nucleiDAPI&channel=0&slide={sid}&roi=40,16,64,96",
        None,
    )
    assert roi  # parses; full equality pinned in test_roi_inference
    pr, _ = post(f"/infer?probe=range&channel=0&slide={sid}", None)
    assert json.loads(pr)["range"] == [
        [float(img.min()), float(img.max())]
    ]
    # stats surface the cache
    with urllib.request.urlopen(server_url + "/stats", timeout=30) as r:
        st = json.loads(r.read())
    assert st["slides_cached"] >= 1 and st["slide_hits"] >= 3

    for bad_q, bad_body, code in [
        (f"/infer?model=nucleiDAPI&slide={'0' * 32}", None, 404),
        (f"/infer?model=nucleiDAPI&slide=ZZZ", None, 400),
        (f"/infer?model=nucleiDAPI&slide={sid}", body, 400),
    ]:
        req = urllib.request.Request(
            server_url + bad_q, data=bad_body, method="POST",
            headers={"Content-Type": "application/octet-stream"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == code, bad_q


def test_slide_delete(server_url, tmp_path, rng):
    """DELETE /slides/<id> frees the cache entry now (viewer closed the
    slide): later requests 404, re-delete 404s, re-upload revives; a
    doomed-with-readers entry defers to the last release."""
    import urllib.error

    img = (rng.rand(120, 90) * 60000).astype(np.uint16)
    p = str(tmp_path / "del.tif")
    imwrite(p, img)
    body = open(p, "rb").read()

    def req(method, path_q, data=None):
        r = urllib.request.Request(
            server_url + path_q, data=data, method=method,
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(r, timeout=300) as resp:
            return resp.read()

    sid = json.loads(req("POST", "/slides", body))["slide_id"]
    assert req("POST", f"/infer?model=nucleiDAPI&channel=0&slide={sid}")
    assert json.loads(req("DELETE", f"/slides/{sid}"))["dropped"] == sid
    for method, path_q in [
        ("POST", f"/infer?model=nucleiDAPI&channel=0&slide={sid}"),
        ("DELETE", f"/slides/{sid}"),
        ("DELETE", "/nope"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            req(method, path_q)
        assert ei.value.code == 404, path_q
    # re-upload revives the id
    up = json.loads(req("POST", "/slides", body))
    assert up["slide_id"] == sid and not up["deduplicated"]

    # deferred drop: a pinned reader keeps the path alive; the last
    # release finalizes (exercised via the ModelServer API — holding an
    # HTTP request open mid-read is not deterministic from out here)
    srv = ModelServer(model_root=os.path.join(REFERENCE, "models"))
    import tempfile as _tf

    spool = _tf.NamedTemporaryFile(delete=False, suffix=".tif")
    spool.write(body)
    spool.close()
    import hashlib

    sid2 = srv.register_slide(
        spool.name, len(body), hashlib.sha256(body).hexdigest()
    )["slide_id"]
    path = srv.acquire_slide(sid2)  # pinned reader
    assert srv.drop_slide(sid2) and os.path.exists(path)  # deferred
    assert not srv.drop_slide(sid2)  # DELETE retry on doomed: 404, once
    assert srv.snapshot()["slide_drops"] == 1
    with pytest.raises(FileNotFoundError):
        srv.acquire_slide(sid2)  # new requests 404 immediately
    srv.release_slide(sid2)  # last reader out -> finalize
    assert not os.path.exists(path)
    assert not srv.drop_slide(sid2)


def test_slide_cache_lru_eviction(tmp_path, rng):
    """The cache evicts least-recently-used entries past the byte
    bound; evicted ids 404 afterward."""
    import urllib.error

    from http.server import ThreadingHTTPServer

    srv = ModelServer(
        model_root=os.path.join(REFERENCE, "models"),
        precision="float32", slide_cache_bytes=30_000,
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        ids = []
        for i in range(3):
            img = (rng.rand(80, 80) * 60000).astype(np.uint16)  # ~12.8kB
            p = str(tmp_path / f"e{i}.tif")
            imwrite(p, img, bigtiff=False)
            req = urllib.request.Request(
                url + "/slides", data=open(p, "rb").read(), method="POST",
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                ids.append(json.loads(r.read())["slide_id"])
        # 3 x ~12.9 kB > 30 kB: the first upload must be gone
        req = urllib.request.Request(
            url + f"/infer?model=nucleiDAPI&channel=0&slide={ids[0]}",
            data=None, method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 404
        # the newest survives
        req = urllib.request.Request(
            url + f"/infer?model=nucleiDAPI&channel=0&slide={ids[2]}",
            data=None, method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_roi_any_offset_bit_identical_with_range(server_url, tmp_path,
                                                 rng):
    """Band snapping aligns EVERY ROI to the full-slide grid: arbitrary
    (unaligned) offsets with a pinned range are bit-identical to the
    full-run crop, and distinct pans reuse the same band geometry
    (compiled-program cache) rather than compiling per window."""
    img = (rng.rand(600, 500) * 20000).astype(np.uint16)
    img[:30] = 60000
    p = str(tmp_path / "pan.tif")
    imwrite(p, img)
    body = open(p, "rb").read()

    def post(query, n):
        req = urllib.request.Request(
            server_url + "/infer?" + query, data=body,
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = r.read()
        dst = tmp_path / f"pan_out{n}.tif"
        dst.write_bytes(out)
        with TiffFile(str(dst)) as tf:
            return np.stack(
                [tf.read_page(i) for i in range(len(tf.pages))]
            )

    rng_q = f"range={float(img.min())},{float(img.max())}"
    full = post(f"model=nucleiDAPI&channel=0&{rng_q}", 0)
    # deliberately awkward offsets — none aligned to the 96-px stride
    for i, (r0, c0, h, w) in enumerate(
        [(203, 37, 111, 155), (350, 260, 97, 83), (449, 1, 150, 499)]
    ):
        roi = post(
            f"model=nucleiDAPI&channel=0&roi={r0},{c0},{h},{w}&{rng_q}",
            i + 1,
        )
        np.testing.assert_array_equal(
            roi, full[:, r0:r0 + h, c0:c0 + w], err_msg=str((r0, c0))
        )


def test_prewarm_on_upload(server_url, tmp_path, rng):
    """POST /slides?prewarm=1 schedules the <=4 band-geometry compiles
    in the background: /stats converges to prewarmed += 4 (one run per
    extreme offset), pans on the cached slide still answer correctly,
    and semantic failures land in prewarm_errors without failing the
    upload."""
    import time as _time
    import urllib.error

    def stats():
        with urllib.request.urlopen(server_url + "/stats", timeout=30) as r:
            return json.loads(r.read())

    def post(path_q, data):
        req = urllib.request.Request(
            server_url + path_q, data=data, method="POST",
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    img = (rng.rand(320, 288) * 60000).astype(np.uint16)
    p = str(tmp_path / "prewarm.tif")
    imwrite(p, img)
    body = open(p, "rb").read()

    before = stats()
    res = post(
        "/slides?prewarm=1&model=nucleiDAPI&roi=64,96&range=0,60000", body
    )
    assert res["prewarm"] == "scheduled"
    sid = res["slide_id"]
    deadline = _time.time() + 300
    while _time.time() < deadline:
        st = stats()
        if (st["prewarm_pending"] == 0
                and st["prewarmed"] >= before["prewarmed"] + 4):
            break
        _time.sleep(0.25)
    st = stats()
    assert st["prewarmed"] == before["prewarmed"] + 4
    assert st["prewarm_errors"] == before["prewarm_errors"]
    # the cached slide still answers pans normally after prewarm
    pan = post(f"/infer?probe=range&channel=0&slide={sid}", None)
    assert pan["range"] == [[float(img.min()), float(img.max())]]

    # square shorthand + offset dedupe: a 288^2 window of the 320x288
    # slide has only 2 distinct extreme offsets (c0 is always 0)
    res = post("/slides?prewarm=1&model=nucleiDAPI&roi=288", body)
    assert res["prewarm"] == "scheduled"
    deadline = _time.time() + 300
    while _time.time() < deadline:
        st2 = stats()
        if (st2["prewarm_pending"] == 0
                and st2["prewarmed"] >= st["prewarmed"] + 2):
            break
        _time.sleep(0.25)
    st2 = stats()
    assert st2["prewarmed"] == st["prewarmed"] + 2

    # semantic failure (window larger than the slide): upload still 200,
    # error recorded asynchronously
    res = post("/slides?prewarm=1&model=nucleiDAPI&roi=1000,1000", body)
    assert res["prewarm"] == "scheduled"
    deadline = _time.time() + 120
    while _time.time() < deadline:
        st3 = stats()
        if st3["prewarm_errors"] > st["prewarm_errors"]:
            break
        _time.sleep(0.25)
    assert st3["prewarm_errors"] == before["prewarm_errors"] + 1
    assert "exceeds" in st3["last_prewarm_error"]

    # syntactic failures are 400 at the door, nothing scheduled
    for bad in [
        "/slides?prewarm=1",                                # roi missing
        "/slides?prewarm=1&roi=0,64",                       # non-positive
        "/slides?prewarm=1&roi=64&model=../../etc",         # traversal
        "/slides?prewarm=maybe&roi=64",                     # bad bool
    ]:
        req = urllib.request.Request(
            server_url + bad, data=body, method="POST",
            headers={"Content-Type": "application/octet-stream"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400, bad


def test_prewarm_bounded_queue(monkeypatch):
    """Prewarm work rides ONE worker thread with a bounded queue: a
    burst of prewarm uploads sheds the excess as 'dropped' (counted)
    instead of accumulating threads that camp on the inflight semaphore
    and starve interactive /infer traffic."""
    import threading as th
    import time as _time

    from unmicst_tpu.serve import ModelServer

    srv = ModelServer(model_root="/nonexistent")
    started, release = th.Event(), th.Event()
    calls = []

    def fake_prewarm(slide_id, **kw):
        calls.append(slide_id)
        started.set()
        release.wait(30)

    monkeypatch.setattr(srv, "prewarm_slide", fake_prewarm)
    assert srv.schedule_prewarm("s0") == "scheduled"
    assert started.wait(10)  # worker is now blocked inside s0
    for i in range(1, 5):  # fills the maxsize-4 queue
        assert srv.schedule_prewarm(f"s{i}") == "scheduled"
    assert srv.schedule_prewarm("s5") == "dropped"
    st = srv.snapshot()
    assert st["prewarm_dropped"] == 1 and st["prewarm_pending"] == 5
    release.set()
    deadline = _time.time() + 30
    while _time.time() < deadline and srv.snapshot()["prewarm_pending"]:
        _time.sleep(0.05)
    assert srv.snapshot()["prewarm_pending"] == 0
    assert calls == [f"s{i}" for i in range(5)]  # s5 never ran
    # the worker restarts for work scheduled after an idle exit
    assert srv.schedule_prewarm("s6") == "scheduled"
    deadline = _time.time() + 30
    while _time.time() < deadline and "s6" not in calls:
        _time.sleep(0.05)
    assert "s6" in calls


def test_device_cached_pans_zero_h2d(server_url, tmp_path, rng,
                                     monkeypatch):
    """The viewer fast path: roi= pans against slide=ID pin the plane
    into device memory once — after that a pan reads ZERO raw rows from
    the container (the band is dynamic_slice'd on device) and the
    response is byte-identical to the body-POST host path."""
    from unmicst_tpu.io import slides as slides_mod

    img = (rng.rand(600, 500) * 60000).astype(np.uint16)
    p = str(tmp_path / "devpan.tif")
    imwrite(p, img)
    body = open(p, "rb").read()

    def post(path_q, data):
        req = urllib.request.Request(
            server_url + path_q, data=data, method="POST",
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.read(), dict(r.headers)

    sid = json.loads(post("/slides", body)[0])["slide_id"]
    q = "model=nucleiDAPI&channel=0&range=0,65535"
    # first pan pins the plane (one full-plane read), later pans are
    # body-less AND read-less
    post(f"/infer?{q}&slide={sid}&roi=40,16,64,96", None)

    calls = []
    orig = slides_mod.ChannelSource.read_rows

    def counting(self, r0, nrows):
        calls.append((r0, nrows))
        return orig(self, r0, nrows)

    monkeypatch.setattr(slides_mod.ChannelSource, "read_rows", counting)
    cached, _ = post(f"/infer?{q}&slide={sid}&roi=300,200,64,96", None)
    assert calls == []  # no raw rows rode the host link
    monkeypatch.undo()
    hosted, _ = post(f"/infer?{q}&roi=300,200,64,96", body)
    assert cached == hosted  # byte-identical TIFF vs the host path

    with urllib.request.urlopen(server_url + "/stats", timeout=30) as r:
        st = json.loads(r.read())
    assert st["device_pins"] >= 1 and st["device_pans"] >= 2
    assert st["device_plane_bytes_used"] >= img.nbytes


def test_device_cached_pans_duo(tmp_path, rng):
    """Duo (2-channel) pans pin a [C, H, W] stack; device == host."""
    from tests.test_cli_variants import _make_model_dir
    from unmicst_tpu.core.hp import HParams

    zoo = str(tmp_path / "zoo")
    os.makedirs(zoo)
    _make_model_dir(
        zoo, "duoTest",
        HParams(im_size=32, n_channels=2, n_classes=3, n_out0=4, ks=3,
                n_layers=2),
        "duo",
    )
    srv = ModelServer(model_root=zoo, precision="float32")
    src = str(tmp_path / "in.tif")
    for i in range(2):
        imwrite(src, (rng.rand(200, 180) * 60000).astype(np.uint16),
                bigtiff=False, append=i > 0)
    roi = (30, 40, 64, 64)
    hosted, _ = srv.infer_tiff_path(src, "duoTest", [0, 1], True, -1,
                                    roi=roi)
    cached, _ = srv.infer_tiff_path(src, "duoTest", [0, 1], True, -1,
                                    roi=roi, slide_id="deadbeef")
    cached2, _ = srv.infer_tiff_path(src, "duoTest", [0, 1], True, -1,
                                     roi=roi, slide_id="deadbeef")
    assert cached == hosted == cached2
    st = srv.snapshot()
    assert st["device_pins"] == 1 and st["device_pans"] == 2


def test_device_cached_pans_czi(tmp_path, rng):
    """The viewer protocol is container-agnostic: a CZI slide pins its
    HBM plane and pans exactly like TIFF (cached == host path)."""
    from tests.test_slides_czi_nd2 import write_czi

    img = (rng.rand(200, 180) * 60000).astype(np.uint16)
    p = str(tmp_path / "pan.czi")
    write_czi(p, [img])
    srv = ModelServer(model_root=os.path.join(REFERENCE, "models"))
    roi = (30, 40, 64, 64)
    hosted, _ = srv.infer_tiff_path(p, "nucleiDAPI", 0, True, -1,
                                    roi=roi)
    cached, _ = srv.infer_tiff_path(p, "nucleiDAPI", 0, True, -1,
                                    roi=roi, slide_id="feedface")
    cached2, _ = srv.infer_tiff_path(p, "nucleiDAPI", 0, True, -1,
                                     roi=roi, slide_id="feedface")
    assert cached == hosted == cached2
    st = srv.snapshot()
    assert st["device_pins"] == 1 and st["device_pans"] == 2


def test_device_cache_budget_and_eviction(tmp_path, rng):
    """Over-budget slides fall back to the host path (still correct);
    within-budget planes LRU-evict so HBM use stays bounded."""
    from http.server import ThreadingHTTPServer

    plane_bytes = 300 * 250 * 2
    srv = ModelServer(
        model_root=os.path.join(REFERENCE, "models"),
        precision="float32",
        device_slide_bytes=int(plane_bytes * 1.5),  # fits ONE plane
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"

    def post(path_q, data):
        req = urllib.request.Request(
            url + path_q, data=data, method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.read()

    try:
        sids = []
        for i in range(2):
            img = (rng.rand(300, 250) * 60000).astype(np.uint16)
            p = str(tmp_path / f"dev{i}.tif")
            imwrite(p, img, bigtiff=False)
            sids.append(
                json.loads(post("/slides", open(p, "rb").read()))
                ["slide_id"]
            )
        for sid in sids:
            post(f"/infer?model=nucleiDAPI&channel=0&slide={sid}"
                 "&roi=50,50,64,64", None)
        st = srv.snapshot()
        assert st["device_pins"] == 2  # both pinned...
        assert st["device_planes_pinned"] == 1  # ...first LRU-evicted
        assert st["device_plane_bytes_used"] <= srv.device_slide_bytes

        # an over-budget slide (plane > bound) serves via the host path
        big = (rng.rand(500, 400) * 60000).astype(np.uint16)
        p = str(tmp_path / "big.tif")
        imwrite(p, big, bigtiff=False)
        sid = json.loads(post("/slides", open(p, "rb").read()))["slide_id"]
        out = post(f"/infer?model=nucleiDAPI&channel=0&slide={sid}"
                   "&roi=50,50,64,64", None)
        assert out
        st = srv.snapshot()
        assert st["device_pins"] == 2  # unchanged: it was not pinned

        # disabled cache (bytes=0) never pins
        srv.device_slide_bytes = 0
        post(f"/infer?model=nucleiDAPI&channel=0&slide={sids[1]}"
             "&roi=10,10,64,64", None)
    finally:
        httpd.shutdown()
        httpd.server_close()
