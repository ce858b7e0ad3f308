"""Serving: JSON contract of POST /photo (`buildAPI.py:82-149`) over real HTTP."""
import base64
import json
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from building_detection_tpu.core.config import Config
from building_detection_tpu.serve import client as bdt_client
from building_detection_tpu.serve.server import (
    DetectionService,
    make_handler,
    parse_multipart,
)
from building_detection_tpu.utils import io as uio


class StubPipeline:
    """Stands in for the 5-model ensemble: thresholds the red channel."""

    def predict_image(self, image_rgb):
        from building_detection_tpu.infer.pipeline import PredictResult

        fused = np.where(image_rgb[..., 0] > 128, 255, 0).astype(np.uint8)
        corners = [[[1, 5, 5, 1, 1], [1, 1, 5, 5, 1]]]
        return PredictResult({}, fused, corners, image_rgb.shape[0])


@pytest.fixture()
def server(tmp_path):
    service = DetectionService(StubPipeline(), Config(), root_dir=str(tmp_path))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd, tmp_path
    httpd.shutdown()


def make_image(tmp_path, name="up.png"):
    img = np.zeros((32, 32, 3), np.uint8)
    img[8:24, 8:24, 0] = 255
    path = str(tmp_path / name)
    uio.imwrite(path, img)
    return path


class TestMultipart:
    def test_roundtrip(self):
        body, ctype = bdt_client.encode_multipart("file", "a.png", b"\x89PNG123")
        fields = parse_multipart(body, ctype)
        assert fields["file"] == ("a.png", b"\x89PNG123")

    def test_trailing_newlines_preserved(self):
        """Only the single boundary CRLF is stripped; payloads that end in
        newline bytes (TIFF/BMP/text) survive intact."""
        payload = b"data ends in newlines\r\n\r\n\n"
        body, ctype = bdt_client.encode_multipart("file", "a.bin", payload)
        fields = parse_multipart(body, ctype)
        assert fields["file"] == ("a.bin", payload)


class TestPhotoEndpoint:
    def test_success_contract(self, server):
        httpd, tmp_path = server
        port = httpd.server_address[1]
        path = make_image(tmp_path)
        data = bdt_client.detect(
            path,
            url=f"http://127.0.0.1:{port}/photo",
            client_id="10_0_0_1",
            save_result_to=str(tmp_path / "result_back.png"),
        )
        # exact key set + formats (buildAPI.py:122-147)
        assert set(data) == {"status", "data", "points", "error"}
        assert data["status"] == "success"
        assert data["error"] == "None"
        assert data["points"] == {"0": "1,1 5,1 5,5 1,5 1,1 "}
        decoded = base64.b64decode(data["data"])
        assert decoded[:4] == b"\x89PNG"
        # result image round-trips through base64
        back = uio.imread_gray(str(tmp_path / "result_back.png"))
        assert back.shape == (32, 32)
        assert set(np.unique(back)) <= {0, 255}
        # per-client result dir, upload saved (buildAPI.py:86-109); the
        # upload name gets a unique prefix (concurrent same-name uploads)
        assert (tmp_path / "all_result" / "10_0_0_1" / "result.png").exists()
        assert list((tmp_path / "receive_file").glob("*_up.png"))

    def test_missing_file_is_ng(self, server):
        import urllib.request

        httpd, _ = server
        port = httpd.server_address[1]
        body, ctype = bdt_client.encode_multipart("other", "x.png", b"123")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/photo",
            data=body,
            headers={"Content-Type": ctype, "clientID": "c"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            data = json.loads(resp.read())
        assert data["status"] == "NG"
        assert data["points"] == {} and data["data"] is None

    def test_corrupt_image_is_ng(self, server, tmp_path):
        import urllib.request

        httpd, _ = server
        port = httpd.server_address[1]
        body, ctype = bdt_client.encode_multipart("file", "bad.png", b"not an image")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/photo",
            data=body,
            headers={"Content-Type": ctype, "clientID": "c"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            data = json.loads(resp.read())
        assert data["status"] == "NG"

    def test_unknown_path_404(self, server):
        import urllib.error
        import urllib.request

        httpd, _ = server
        port = httpd.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/other", data=b"", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 404


class TestRequestLimits:
    """Hardening beyond the reference: bounded bodies + request deadlines
    (the reference reads Content-Length bytes unbounded, buildAPI.py:104)."""

    def test_oversized_post_is_413_without_reading_body(self, tmp_path):
        """A huge declared Content-Length is rejected from the HEADERS alone:
        the 413 arrives although not one body byte was ever sent."""
        import socket

        from building_detection_tpu.core.config import ServeConfig

        cfg = Config(serve=ServeConfig(max_request_bytes=1024))
        service = DetectionService(StubPipeline(), cfg, root_dir=str(tmp_path))
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            port = httpd.server_address[1]
            with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
                s.sendall(
                    b"POST /photo HTTP/1.1\r\n"
                    b"Host: x\r\n"
                    b"Content-Type: multipart/form-data; boundary=b\r\n"
                    b"Content-Length: 10000000000\r\n"  # 10 GB, never sent
                    b"\r\n"
                )
                s.settimeout(10)
                resp = b""
                while b"exceeds limit" not in resp:
                    chunk = s.recv(65536)
                    if not chunk:
                        break
                    resp += chunk
                resp = resp.decode("utf-8", "replace")
            assert " 413 " in resp.split("\r\n")[0]
            assert "exceeds limit" in resp
        finally:
            httpd.shutdown()

    def test_under_limit_post_still_succeeds(self, tmp_path):
        from building_detection_tpu.core.config import ServeConfig

        cfg = Config(serve=ServeConfig(max_request_bytes=1 << 20))
        service = DetectionService(StubPipeline(), cfg, root_dir=str(tmp_path))
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            port = httpd.server_address[1]
            path = make_image(tmp_path)
            data = bdt_client.detect(
                path, url=f"http://127.0.0.1:{port}/photo", client_id="ok_1"
            )
            assert data["status"] == "success"
        finally:
            httpd.shutdown()

    def test_stalled_upload_frees_the_worker(self, tmp_path):
        """Slow-loris: declare a body, send half, stall.  The worker must
        come free within the configured deadline — proven by a NORMAL request
        succeeding immediately afterwards on a 1-worker-relevant path."""
        import socket
        import time

        from building_detection_tpu.core.config import ServeConfig

        cfg = Config(serve=ServeConfig(request_timeout_s=1.0))
        service = DetectionService(StubPipeline(), cfg, root_dir=str(tmp_path))
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            port = httpd.server_address[1]
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            s.sendall(
                b"POST /photo HTTP/1.1\r\n"
                b"Host: x\r\n"
                b"Content-Type: multipart/form-data; boundary=b\r\n"
                b"Content-Length: 1000\r\n"
                b"\r\n"
                b"partial body then silence"
            )
            t0 = time.monotonic()
            s.settimeout(15)
            # server must give up on its own (408 or straight close) in
            # about request_timeout_s, not hang forever
            resp = b""
            try:
                while True:
                    chunk = s.recv(4096)
                    if not chunk:
                        break
                    resp += chunk
            except OSError:
                pass
            elapsed = time.monotonic() - t0
            s.close()
            assert elapsed < 10, f"worker stayed wedged {elapsed:.1f}s"
            if resp:  # if an answer made it out it is the timeout NG
                assert b"408" in resp.split(b"\r\n")[0] or b"NG" in resp
            # the server is still healthy for the next client
            path = make_image(tmp_path)
            data = bdt_client.detect(
                path, url=f"http://127.0.0.1:{port}/photo", client_id="after"
            )
            assert data["status"] == "success"
        finally:
            httpd.shutdown()

    def test_drip_fed_body_hits_overall_deadline(self, tmp_path):
        """A persistent drip-feeder (1 byte per interval, NEVER stopping) is
        cut off at the overall body deadline.  Each received byte resets the
        per-recv socket timeout, so only the deadline-shrunk socket timeout
        in ``_read_body`` can end this request — the client here keeps
        dripping far past ``request_timeout_s`` and the server must kill the
        request anyway (round-4 ADVICE: the previous test stopped dripping
        after 8s, letting the plain socket timeout pass for the fix)."""
        import select
        import socket
        import time

        from building_detection_tpu.core.config import ServeConfig

        cfg = Config(serve=ServeConfig(request_timeout_s=1.0))
        service = DetectionService(StubPipeline(), cfg, root_dir=str(tmp_path))
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            port = httpd.server_address[1]
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            s.sendall(
                b"POST /photo HTTP/1.1\r\nHost: x\r\n"
                b"Content-Type: multipart/form-data; boundary=b\r\n"
                b"Content-Length: 1000000\r\n\r\n"
            )
            t0 = time.monotonic()
            cut_at = None
            for _ in range(100):  # up to ~20s of dripping, deadline is 1s
                try:
                    s.sendall(b"x")
                except OSError:  # server closed; kernel answered with RST
                    cut_at = time.monotonic() - t0
                    break
                readable, _, _ = select.select([s], [], [], 0)
                if readable:
                    data = s.recv(4096)
                    if not data or b"408" in data or b"NG" in data:
                        cut_at = time.monotonic() - t0
                        break
                time.sleep(0.2)
            s.close()
            assert cut_at is not None, (
                "server never cut off a persistently drip-feeding client"
            )
            assert cut_at < 8, (
                f"drip-feed held the worker {cut_at:.1f}s (deadline 1s)"
            )
        finally:
            httpd.shutdown()


class TestHealthAndDrain:
    """Ops endpoints beyond the reference (whose only probe is a full
    inference): GET /health liveness and SIGTERM graceful drain."""

    def test_health_ok_over_http(self, server):
        import urllib.request

        httpd, _ = server
        port = httpd.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=10
        ) as resp:
            data = json.loads(resp.read())
        assert resp.status == 200
        assert data["status"] == "ok"
        assert data["inflight"] == 0
        assert data["queued"] == 0  # micro-batcher backlog exposed

    def test_get_unknown_path_404(self, server):
        import urllib.error
        import urllib.request

        httpd, _ = server
        port = httpd.server_address[1]
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/other", timeout=10)
        assert e.value.code == 404

    def test_drain_finishes_inflight_then_rejects(self, tmp_path):
        """Drain mid-load: the in-flight request completes successfully,
        /health flips to 503, and new POSTs are refused."""
        import time
        import urllib.error
        import urllib.request

        release = threading.Event()
        started = threading.Event()

        class SlowPipeline(StubPipeline):
            def predict_image(self, image_rgb):
                started.set()
                assert release.wait(30), "drain deadlocked the request"
                return super().predict_image(image_rgb)

        service = DetectionService(
            SlowPipeline(), Config(), root_dir=str(tmp_path)
        )
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        port = httpd.server_address[1]
        path = make_image(tmp_path)
        result = {}

        def request():
            result["data"] = bdt_client.detect(
                path, url=f"http://127.0.0.1:{port}/photo", client_id="c1"
            )

        req_thread = threading.Thread(target=request)
        req_thread.start()
        assert started.wait(10)

        # begin the drain exactly as serve()'s signal handler does
        service.draining = True
        shut = threading.Thread(target=httpd.shutdown)
        shut.start()

        # health now reports draining/503 (the service-level contract;
        # over HTTP the listener may already be closed by shutdown)
        payload, code = service.health()
        assert code == 503 and payload["status"] == "draining"
        assert payload["inflight"] == 1

        # a new POST while draining is rejected: 503 if a handler picks it
        # up, or never-accepted/refused once shutdown() stopped the accept
        # loop (the connect may sit in the listen backlog, hence the
        # short client timeout)
        try:
            bdt_client.detect(
                path, url=f"http://127.0.0.1:{port}/photo", client_id="c2",
                timeout=3.0,
            )
            rejected = False
        except (urllib.error.HTTPError, urllib.error.URLError, OSError):
            rejected = True
        assert rejected, "draining server accepted new work"

        # the in-flight request runs to successful completion
        release.set()
        drained = service.drain(timeout_s=15)
        req_thread.join(15)
        shut.join(15)
        httpd.server_close()
        assert drained
        assert result["data"]["status"] == "success"
        # the batcher is closed: direct predict raises instead of hanging
        with pytest.raises(RuntimeError):
            service._batcher.predict(np.zeros((4, 4, 3), np.uint8))

    def test_sigterm_drains_live_server(self, tmp_path):
        """End-to-end: a real serve() process under SIGTERM mid-request
        finishes the in-flight request, logs the drain, and exits 0."""
        import os
        import signal
        import subprocess
        import sys
        import time
        import urllib.request

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        prog = (
            "import sys, time\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import numpy as np\n"
            "from building_detection_tpu.core.config import Config\n"
            "from building_detection_tpu.infer.pipeline import PredictResult\n"
            "from building_detection_tpu.serve.server import serve\n"
            "class Slow:\n"
            "    def predict_image(self, img):\n"
            "        time.sleep(2.0)\n"
            "        fused = np.where(img[...,0] > 128, 255, 0).astype(np.uint8)\n"
            "        return PredictResult({}, fused,"
            " [[[1,5,5,1,1],[1,1,5,5,1]]], img.shape[0])\n"
            "from building_detection_tpu.core.config import ServeConfig\n"
            "import dataclasses\n"
            "cfg = Config(serve=ServeConfig(host='127.0.0.1', port=0,"
            " drain_timeout_s=20.0))\n"
            "serve(Slow(), cfg, root_dir=sys.argv[1], warmup=False)\n"
        )
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.Popen(
            [sys.executable, "-c", prog, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(tmp_path), env=env,
        )
        try:
            port = None
            for _ in range(100):
                line = proc.stdout.readline()
                if line.startswith("serving on"):
                    port = int(line.strip().rsplit(":", 1)[1])
                    break
            assert port, "server never came up"

            path = make_image(tmp_path)
            result = {}

            def request():
                result["data"] = bdt_client.detect(
                    path, url=f"http://127.0.0.1:{port}/photo", client_id="c"
                )

            t = threading.Thread(target=request)
            t.start()
            time.sleep(0.7)  # let the request reach the slow predict
            proc.send_signal(signal.SIGTERM)
            t.join(20)
            out = proc.communicate(timeout=20)[0]
            assert proc.returncode == 0, out
            assert "draining" in out and "drained, bye." in out, out
            assert result.get("data", {}).get("status") == "success", (
                result, out,
            )
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.communicate()


class TestPointsFormat:
    def test_points_dict_format(self):
        corners = [[[1, 2, 1], [3, 4, 3]], [[9, 9], [8, 8]]]
        d = uio.points_dict(corners)
        assert d == {"0": "1,3 2,4 1,3 ", "1": "9,8 9,8 "}


class TestClientIdSafety:
    """The reference joins the clientID header into a path unchecked
    (buildAPI.py:86-92); the rebuild validates it before any rmtree."""

    @pytest.mark.parametrize(
        "cid", ["../..", "..", ".", "/etc", "a/b", "a\\b", "x y", ""]
    )
    def test_hostile_client_id_is_ng(self, tmp_path, cid):
        service = DetectionService(StubPipeline(), Config(), root_dir=str(tmp_path))
        canary = tmp_path.parent / "canary.txt"
        canary.write_text("alive")
        resp = service.handle_photo(cid or "/", "a.png", b"payload")
        assert resp["status"] == "NG"
        assert "invalid clientID" in resp["error"]
        assert canary.exists()

    def test_ip_derived_ids_pass_validation(self, tmp_path):
        service = DetectionService(StubPipeline(), Config(), root_dir=str(tmp_path))
        # the reference client derives IDs like 192_168_0_1 (CLient/Client.py:8-24)
        service._user_dir("192_168_0_1")
        service._user_dir("user-1.a_b")


class TestMicroBatcher:
    def test_concurrent_requests_coalesce(self):
        """Queued-up requests drain into ONE predict_images call."""
        import concurrent.futures
        import time

        from building_detection_tpu.serve.server import _MicroBatcher

        calls = []
        gate = threading.Event()

        class SlowBatchPipeline:
            def predict_image(self, image):
                gate.wait(10)
                calls.append(1)
                return ("one", image.sum())

            def predict_images(self, images):
                gate.wait(10)
                calls.append(len(images))
                return [("many", img.sum()) for img in images]

        batcher = _MicroBatcher(SlowBatchPipeline())
        with concurrent.futures.ThreadPoolExecutor(5) as ex:
            futs = [
                ex.submit(batcher.predict, np.full((2, 2), i))
                for i in range(5)
            ]
            time.sleep(0.2)  # let all five enqueue while the worker blocks
            gate.set()
            results = [f.result(timeout=10) for f in futs]
        batcher.close()
        # every caller got ITS image's result back
        assert [r[1] for r in results] == [4 * i for i in range(5)]
        # fewer device calls than requests => coalescing happened
        assert len(calls) < 5
        assert any(c > 1 for c in calls)

    def test_short_result_list_is_an_error_not_none(self):
        """A pipeline returning fewer results than scenes must raise at every
        waiter — not silently hand the unpaired ones ``None``."""
        import concurrent.futures
        import time

        from building_detection_tpu.serve.server import _MicroBatcher

        gate = threading.Event()      # releases the worker's first (solo) job
        worker_busy = threading.Event()

        class ShortPipeline:
            def predict_image(self, image):  # solo batches take this path
                worker_busy.set()
                gate.wait(10)
                return ("one", image.sum())

            def predict_images(self, images):
                return [("many", img.sum()) for img in images[:-1]]

        batcher = _MicroBatcher(ShortPipeline())
        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            decoy = ex.submit(batcher.predict, np.zeros((2, 2)))
            # once the worker is parked inside the decoy's predict_image,
            # the next three enqueue behind it and MUST drain as one batch
            assert worker_busy.wait(10)
            futs = [
                ex.submit(batcher.predict, np.full((2, 2), i))
                for i in range(3)
            ]
            time.sleep(0.2)  # let all three enqueue while the worker blocks
            gate.set()
            assert decoy.result(timeout=10)[0] == "one"
            for f in futs:
                exc = f.exception(timeout=10)
                assert isinstance(exc, RuntimeError) and (
                    "returned 2 results" in str(exc)
                ), f"expected the short-results error, got {exc!r}"
        batcher.close()

    def test_batch_error_propagates_to_all_waiters(self):
        from building_detection_tpu.serve.server import _MicroBatcher

        class FailingPipeline:
            def predict_image(self, image):
                raise RuntimeError("boom")

        batcher = _MicroBatcher(FailingPipeline())
        with pytest.raises(RuntimeError, match="boom"):
            batcher.predict(np.zeros((2, 2)))
        batcher.close()


class TestRealPipelineIntegration:
    """End-to-end over real HTTP with a REAL Pipeline (one zoo model, tiny
    tiles, 1-of-1 vote) — the full predict -> fuse -> polygons -> JSON path
    with no stubs."""

    def test_photo_roundtrip_real_pipeline(self, tmp_path):
        import jax.numpy as jnp

        from building_detection_tpu.core.config import (
            Config, FuseConfig, TilerConfig,
        )
        from building_detection_tpu.infer.pipeline import Pipeline

        cfg = Config(
            tiler=TilerConfig(tile=32, stride=24, overlap=8),
            fuse=FuseConfig(num_models=1, vote_threshold=1),
        )
        pipe = Pipeline(
            cfg=cfg, models=("res34",), batch_tiles=2,
            compute_dtype=jnp.float32,
        )
        service = DetectionService(pipe, cfg, root_dir=str(tmp_path))
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        try:
            port = httpd.server_address[1]
            rng = np.random.RandomState(0)
            img = rng.randint(0, 256, (48, 64, 3), np.uint8)
            path = str(tmp_path / "scene.png")
            uio.imwrite(path, img)
            data = bdt_client.detect(
                path, url=f"http://127.0.0.1:{port}/photo", client_id="it_1"
            )
            assert data["status"] == "success", data["error"]
            assert set(data) == {"status", "data", "points", "error"}
            back = base64.b64decode(data["data"])
            assert back[:4] == b"\x89PNG"
            mask = uio.imread_gray(
                str(tmp_path / "all_result" / "it_1" / "result.png")
            )
            assert mask.shape == (48, 64)
            assert set(np.unique(mask)) <= {0, 255}
            # points strings parse back into closed integer rings
            for ring in data["points"].values():
                pairs = [p for p in ring.strip().split(" ") if p]
                assert all("," in p for p in pairs)
                assert pairs[0] == pairs[-1]  # closed (edge_3.py:379-387)
        finally:
            httpd.shutdown()


class TestConcurrentRequests:
    def test_two_clients_simultaneously(self, server, tmp_path):
        """The service lock serializes predictions; both clients succeed and
        get isolated per-client result dirs (buildAPI.py:86-92)."""
        import concurrent.futures

        httpd, root = server
        port = httpd.server_address[1]
        path = make_image(root, "both.png")

        def call(cid):
            return bdt_client.detect(
                path, url=f"http://127.0.0.1:{port}/photo", client_id=cid
            )

        with concurrent.futures.ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(call, f"client_{i}") for i in range(2)]
            results = [f.result(timeout=60) for f in futs]
        assert all(r["status"] == "success" for r in results)
        assert (root / "all_result" / "client_0" / "result.png").exists()
        assert (root / "all_result" / "client_1" / "result.png").exists()

    def test_same_client_concurrent_serializes(self, tmp_path):
        """Concurrent SAME-client requests hold one lock end-to-end (the
        per-request dir reset would otherwise delete the dir another request
        is writing its result into)."""
        import io

        from PIL import Image

        svc = DetectionService(StubPipeline(), Config(), root_dir=str(tmp_path))
        buf = io.BytesIO()
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, "PNG")
        payload = buf.getvalue()
        results = []

        def hit():
            results.append(svc.handle_photo("one_client", "a.png", payload))

        threads = [threading.Thread(target=hit) for _ in range(8)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert all(r["status"] == "success" for r in results), results
        assert (tmp_path / "all_result" / "one_client" / "result.png").exists()
        # the refcount drains so the entry is evictable again
        assert svc._client_locks["one_client"][1] == 0

    def test_client_lock_table_lru_bounded(self, tmp_path, monkeypatch):
        """clientID is unauthenticated input: the lock table must not grow
        monotonically with unique IDs (memory exhaustion otherwise)."""
        import io

        from PIL import Image

        svc = DetectionService(StubPipeline(), Config(), root_dir=str(tmp_path))
        monkeypatch.setattr(DetectionService, "_MAX_CLIENT_LOCKS", 16)
        buf = io.BytesIO()
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, "PNG")
        payload = buf.getvalue()
        for i in range(40):
            r = svc.handle_photo(f"cli_{i}", "a.png", payload)
            assert r["status"] == "success"
        assert len(svc._client_locks) <= 16
        # most-recent clients survive the LRU (re-insert = touch)
        assert "cli_39" in svc._client_locks
