"""On-chip serving benchmark for ``unmicst_tpu.serve`` (r3 verdict item 4).

Drives a live in-process ``ModelServer`` over localhost HTTP — the same
handler stack production uses (spool-to-disk, backpressure semaphore,
TIFF encode) — and reports requests/s and P50/P99 latency for:

  a. small-ROI TIFF bodies (512x512 uint16), sequential + concurrent,
  b. a streaming mega-slide (8192x8192 > ``stream_above_px``),
  c. ``scale=0.5``, ``pyramid=1``, ``compress=deflate`` variants (2048x2048).

Method: 1 warmup request per workload (compile + engine build excluded),
then timed requests; latency is client-observed wall on localhost.  The
dev-environment caveat stands: inference rides the ~20 MB/s tunnel, so
absolute numbers are transfer-bound (BASELINE.md) — ratios between
workloads and the backpressure behavior are the portable signal.

Run on chip:  python - < scripts/serve_bench_tpu.py
CPU smoke:    SERVE_BENCH_SMOKE=1 python - < scripts/serve_bench_tpu.py
Writes scripts/serve_bench_report.json.
"""

import io
import json
import os
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np

SMOKE = os.environ.get("SERVE_BENCH_SMOKE", "0") == "1"
if SMOKE:
    import jax

    jax.config.update("jax_platforms", "cpu")

from unmicst_tpu.io.tiff import imwrite  # noqa: E402
from unmicst_tpu.serve import ModelServer, make_handler  # noqa: E402
from unmicst_tpu.utils.compcache import enable as enable_cache  # noqa: E402

MODEL_ROOT = os.environ.get(
    "SERVE_BENCH_MODEL_ROOT", "/root/reference/models"
)
MODEL = os.environ.get("SERVE_BENCH_MODEL", "nucleiDAPI")
# (label, slide side, n timed, concurrency, extra query params)
if SMOKE:
    WORKLOADS = [
        ("small_roi_seq", 96, 3, 1, ""),
        ("small_roi_conc4", 96, 4, 4, ""),
        ("stream_mega", 1024, 1, 1, ""),
        # ROI bands snap to the tile grid (min ~576^2 for the 128/16
        # model), so the windowed bound must clear that while the
        # stream_mega slide stays above it
        ("roi_512_of_8k", 640, 2, 1, "&roi=120,120,64,64&range=0,60000"),
        ("scale_0.5", 128, 2, 1, "&scale=0.5"),
        ("pyramid", 640, 1, 1, "&pyramid=1"),
        ("deflate", 128, 2, 1, "&compress=deflate"),
    ]
    STREAM_ABOVE_PX = 600_000  # stream 1024^2; pass ~576^2 roi bands
else:
    WORKLOADS = [
        ("small_roi_seq", 512, 20, 1, ""),
        ("small_roi_conc4", 512, 20, 4, ""),
        ("stream_mega", 8192, 2, 1, ""),
        # the interactive-viewer path: a 512^2 window of an 8k^2 slide,
        # normalization pinned (probe-once-then-pin protocol) — compare
        # against stream_mega's whole-slide wall for the same body
        ("roi_512_of_8k", 8192, 5, 1,
         "&roi=4000,4000,512,512&range=0,60000"),
        ("scale_0.5", 2048, 5, 1, "&scale=0.5"),
        ("pyramid", 2048, 5, 1, "&pyramid=1"),
        ("deflate", 2048, 5, 1, "&compress=deflate"),
    ]
    STREAM_ABOVE_PX = 64_000_000  # server default


def make_body(side: int, seed: int = 0) -> bytes:
    rng = np.random.RandomState(seed)
    raw = (rng.rand(side, side) * 60000).astype(np.uint16)
    buf = io.BytesIO()
    # imwrite takes a path; spool via a temp file once per workload
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".tif") as tmp:
        imwrite(tmp.name, raw, bigtiff=side * side * 2 > (1 << 31))
        tmp.seek(0)
        buf.write(tmp.read())
    return buf.getvalue()


def one_request(url: str, body: bytes, timeout: float = 3600.0) -> dict:
    req = urllib.request.Request(url, data=body, method="POST")
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        out = r.read()
        meta = json.loads(r.headers["X-UnMicst-Meta"])
    dt = time.perf_counter() - t0
    return {"wall_s": dt, "out_bytes": len(out), "meta": meta}


def run_cached_pans(base: str, label: str, side: int, n: int,
                    roi_hw: int, extra: str = "") -> dict:
    """The interactive-viewer protocol: ONE /slides upload, then n
    body-less roi= pans at scattered offsets.

    Band snapping means a (slide, roi-size) pair compiles at most FOUR
    XLA programs: interior, bottom-edge, right-edge, corner (the exact
    end clip that keeps edge pans bit-identical to the full-slide grid
    gives the edge bands their own heights).  We pre-warm all four so
    the timed pans measure steady-state viewer latency; the geometry
    compiles are reported separately as warmup_interior_s /
    warmup_edge_s (bottom, right, corner)."""
    body = make_body(side)
    print(f"[{label}] {side}x{side}, {n} cached pans of {roi_hw}^2 ...",
          flush=True)
    t0 = time.perf_counter()
    req = urllib.request.Request(f"{base}/slides", data=body,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=3600) as r:
        sid = json.loads(r.read())["slide_id"]
    upload_s = time.perf_counter() - t0

    def pan_url(r0, c0):
        return (f"{base}/infer?model={MODEL}&slide={sid}"
                f"&roi={r0},{c0},{roi_hw},{roi_hw}&range=0,60000"
                f"{extra}")

    warm_int = one_request(pan_url(0, 0), None)
    e = side - roi_hw  # edge pans: bottom, right, corner band shapes
    warm_edges = [one_request(pan_url(r0, c0), None)["wall_s"]
                  for r0, c0 in ((e, 0), (0, e), (e, e))]
    walls = []
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        r0 = (i * 977) % max(1, side - roi_hw)
        c0 = (i * 1499) % max(1, side - roi_hw)
        walls.append(one_request(pan_url(r0, c0), None)["wall_s"])
    total = time.perf_counter() - t0
    walls.sort()
    rec = {
        "slide": f"{side}x{side}",
        "roi": f"{roi_hw}x{roi_hw}",
        "n": n,
        "upload_s": round(upload_s, 3),
        "warmup_interior_s": round(warm_int["wall_s"], 3),
        "warmup_edge_s": [round(w, 3) for w in warm_edges],
        "p50_s": round(walls[len(walls) // 2], 4),
        "p99_s": round(walls[min(len(walls) - 1, int(len(walls) * 0.99))],
                       4),
        "min_s": round(walls[0], 4),
        "pans_per_s": round(n / total, 3),
    }
    print(f"[{label}] {json.dumps(rec)}")
    return rec


def run_workload(base: str, label: str, side: int, n: int, conc: int,
                 extra: str) -> dict:
    url = f"{base}/infer?model={MODEL}&channel=0{extra}"
    body = make_body(side)
    print(f"[{label}] {side}x{side}, n={n}, conc={conc} ... warmup")
    warm = one_request(url, body)  # compile + engine build
    walls = []
    t0 = time.perf_counter()
    if conc == 1:
        for _ in range(n):
            walls.append(one_request(url, body)["wall_s"])
    else:
        with ThreadPoolExecutor(max_workers=conc) as ex:
            futs = [ex.submit(one_request, url, body) for _ in range(n)]
            walls = [f.result()["wall_s"] for f in futs]
    total = time.perf_counter() - t0
    walls.sort()
    rec = {
        "slide": f"{side}x{side}",
        "n": n,
        "concurrency": conc,
        "warmup_s": round(warm["wall_s"], 3),
        "p50_s": round(walls[len(walls) // 2], 4),
        "p99_s": round(walls[min(len(walls) - 1, int(len(walls) * 0.99))], 4),
        "min_s": round(walls[0], 4),
        "rps": round(n / total, 3),
        "mpx_s": round(n * side * side / 1e6 / total, 3),
        "out_bytes": warm["out_bytes"],
        "infer_s_server": warm["meta"].get("infer_s"),
    }
    print(f"[{label}] {json.dumps(rec)}")
    return rec


def main() -> None:
    enable_cache()
    from http.server import ThreadingHTTPServer

    import jax

    srv = ModelServer(
        model_root=MODEL_ROOT,
        precision=os.environ.get("SERVE_BENCH_PRECISION", "float32"),
        stream_above_px=STREAM_ABOVE_PX,
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    report = {
        "device": str(jax.devices()[0]),
        "smoke": SMOKE,
        "model": MODEL,
        "precision": srv.precision,
        "stream_above_px": STREAM_ABOVE_PX,
        "note": (
            "client-observed localhost HTTP wall; inference itself rides "
            "the dev tunnel (~20 MB/s) — see BASELINE.md methodology"
        ),
        "workloads": {},
    }
    try:
        for label, side, n, conc, extra in WORKLOADS:
            report["workloads"][label] = run_workload(
                base, label, side, n, conc, extra
            )
        # the upload-once viewer protocol (slide cache + snapped pans)
        if SMOKE:
            report["workloads"]["roi_cached_pans"] = run_cached_pans(
                base, "roi_cached_pans", 640, 3, 64
            )
            report["workloads"]["roi_cached_pans_1cls"] = run_cached_pans(
                base, "roi_cached_pans_1cls", 640, 3, 64,
                extra="&classes=2"
            )
        else:
            report["workloads"]["roi_cached_pans"] = run_cached_pans(
                base, "roi_cached_pans", 8192, 12, 512
            )
            # single-PM viewer (the MCMICRO common case): 1/3 the D2H
            # and response bytes; upload dedups to the same slide id
            report["workloads"]["roi_cached_pans_1cls"] = run_cached_pans(
                base, "roi_cached_pans_1cls", 8192, 12, 512,
                extra="&classes=2"
            )
        report["server_stats"] = srv.snapshot()
    finally:
        httpd.shutdown()
        httpd.server_close()

    out = ("/root/repo/scripts/serve_bench_smoke.json" if SMOKE
           else "/root/repo/scripts/serve_bench_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}")
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if kk in ("p50_s", "p99_s", "rps", "mpx_s")}
                      for k, v in report["workloads"].items()}))


main()
