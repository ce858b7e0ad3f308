"""Serving throughput: concurrent clients vs serial, over real HTTP.

Measures the cross-request micro-batcher (`serve/server.py::_MicroBatcher`)
against the reference's serving model (one full ensemble round-trip per
request, single-threaded Flask dev server, `buildAPI.py:233`):

* serial: N requests one after another;
* concurrent: the same N requests from C client threads at once — the
  batcher coalesces queued scenes into ONE pipelined ``predict_images``
  call (scene-grouped device dispatch + overlapped host post-processing).

Run on the real chip: ``python scripts/serve_bench.py [N] [C]``.
Prints one JSON line with both throughputs and the speedup.
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from building_detection_tpu.core.config import Config
from building_detection_tpu.core.runtime import enable_compilation_cache
from building_detection_tpu.infer.pipeline import Pipeline
from building_detection_tpu.serve import client as C
from building_detection_tpu.serve.server import DetectionService, make_handler


def main() -> int:
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_clients = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    enable_compilation_cache()

    import tempfile
    from http.server import ThreadingHTTPServer

    root = tempfile.mkdtemp(prefix="serve_bench_")
    pipe = Pipeline()
    service = DetectionService(pipe, Config(), root_dir=root)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}/photo"

    # one scene shape so the batcher's groups share a compiled program;
    # structured content (blobs) keeps host fusion realistic but bounded
    rng = np.random.RandomState(0)
    scene = np.zeros((600, 900, 3), np.uint8)
    for _ in range(12):
        y, x = rng.randint(0, 540), rng.randint(0, 840)
        scene[y : y + 60, x : x + 60] = rng.randint(64, 255, 3, np.uint8)
    import io

    try:
        import PIL.Image as PImage
    except ImportError:
        raise SystemExit("PIL required for the bench payload")
    buf = io.BytesIO()
    PImage.fromarray(scene).save(buf, format="PNG")
    payload = buf.getvalue()

    import tempfile as _tf

    fd, img_path = _tf.mkstemp(suffix=".png", dir=root)
    with os.fdopen(fd, "wb") as f:
        f.write(payload)

    def one(i: int):
        return C.detect(img_path, url=url, client_id=f"c{i}")

    one(0)  # warm: compile + caches (single-scene program)

    # warm every group-size program the batcher can form for up to n_req
    # queued scenes (group sizes are quantized — fused_ensemble._GROUP_SIZES —
    # so this set is small and the persistent compile cache keeps it warm)
    for k in (2, 3, 4, 6, 8):
        if k <= n_req:
            pipe.ensemble.predict_masks_many([scene] * k)

    t0 = time.perf_counter()
    for i in range(n_req):
        r = one(i)
        assert r["status"] == "success", r.get("error")
    serial = n_req / (time.perf_counter() - t0)

    results = [None] * n_req

    def worker(k: int):
        for i in range(k, n_req, n_clients):
            results[i] = one(i)

    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=worker, args=(k,)) for k in range(n_clients)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    concurrent = n_req / (time.perf_counter() - t0)
    assert all(r["status"] == "success" for r in results)

    httpd.shutdown()
    print("timer:", json.dumps(pipe.timer.summary()), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "serve_concurrent_speedup",
                "serial_req_per_s": round(serial, 3),
                "concurrent_req_per_s": round(concurrent, 3),
                "clients": n_clients,
                "speedup": round(concurrent / serial, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
