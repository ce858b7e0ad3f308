"""HTTP serving with the reference's exact JSON contract, on stdlib http.server.

Rebuild of `/root/reference/buildAPI.py`: ``POST /photo`` with a ``clientID``
header and a multipart ``file`` field runs the full ensemble + fusion + edge
extraction and responds::

    {"status": "success", "data": "<base64 result.png>",
     "points": {"0": "x,y x,y ...", ...}, "error": "None"}

Error paths return ``{"status": "NG", "data": null, "points": {}, "error": ...}``
(`buildAPI.py:100-102,148-149`).  Differences from the reference, documented:

* Flask is replaced by ``http.server`` (Flask is not available here, and the
  reference runs Flask's single-threaded dev server anyway);
* ``data`` is a base64 *string* — the reference stuffs a ``bytes`` object
  into its JSON (`buildAPI.py:123-126`), which only serialised on the
  historical Flask 1.x stack;
* models are loaded once at server construction (`buildAPI.py:78`), requests
  are serialised with a lock (one TPU, same effective behaviour as the
  reference's dev server).
"""
from __future__ import annotations

import base64
import json
import os
import re
import shutil
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple


from building_detection_tpu.core.config import Config
from building_detection_tpu.utils import io as uio


def parse_multipart(body: bytes, content_type: str) -> Dict[str, Tuple[str, bytes]]:
    """Minimal multipart/form-data parser: field -> (filename, payload)."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        raise ValueError("no multipart boundary")
    boundary = m.group(1).encode()
    parts = body.split(b"--" + boundary)
    out: Dict[str, Tuple[str, bytes]] = {}
    for part in parts[1:-1]:
        part = part.lstrip(b"\r\n")
        if not part or part in (b"--", b"--\r\n"):
            continue
        try:
            header_blob, payload = part.split(b"\r\n\r\n", 1)
        except ValueError:
            continue
        payload = payload.rstrip(b"\r\n")
        headers = header_blob.decode("utf-8", "replace")
        name_m = re.search(r'name="([^"]*)"', headers)
        file_m = re.search(r'filename="([^"]*)"', headers)
        if name_m:
            out[name_m.group(1)] = (
                file_m.group(1) if file_m else "",
                payload,
            )
    return out


class DetectionService:
    """The request-handling core, separated from HTTP plumbing for testing."""

    def __init__(self, pipeline, cfg: Config = Config(), root_dir: str = "."):
        self.pipeline = pipeline
        self.cfg = cfg
        self.receive_dir = os.path.join(root_dir, cfg.serve.receive_dir)
        self.result_dir = os.path.join(root_dir, cfg.serve.result_dir)
        os.makedirs(self.receive_dir, exist_ok=True)
        os.makedirs(self.result_dir, exist_ok=True)
        self._lock = threading.Lock()

    @staticmethod
    def _ng(error: str) -> dict:
        return {"status": "NG", "data": None, "points": {}, "error": str(error)}

    def handle_photo(
        self, client_id: Optional[str], filename: Optional[str], payload: Optional[bytes]
    ) -> dict:
        """The `/photo` flow (`buildAPI.py:82-149`)."""
        try:
            if not payload:
                return self._ng("传入的图片错误")
            if not filename:
                return self._ng("传入的图片名字为空")
            client_id = client_id or "anonymous"
            user_path = os.path.join(self.result_dir, client_id)
            if os.path.exists(user_path):
                shutil.rmtree(user_path)  # del_file per request (buildAPI.py:92)
            os.makedirs(user_path, exist_ok=True)

            # save the upload (buildAPI.py:104-109)
            file_path = os.path.join(self.receive_dir, os.path.basename(filename))
            with open(file_path, "wb") as f:
                f.write(payload)

            with self._lock:
                image = uio.imread_rgb(file_path)
                result = self.pipeline.predict_image(image)

            result_path = os.path.join(user_path, "result.png")
            uio.imwrite(result_path, result.fused)
            with open(result_path, "rb") as f:
                data_b64 = base64.b64encode(f.read()).decode("ascii")

            points = uio.points_dict(result.corners)
            return {
                "status": "success",
                "data": data_b64,
                "points": points,
                "error": "None",
            }
        except Exception as e:  # broad catch mirrors buildAPI.py:148-149
            return self._ng(repr(e))


def make_handler(service: DetectionService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _respond(self, payload: dict, code: int = 200) -> None:
            blob = json.dumps(payload, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_POST(self):
            if self.path != "/photo":
                self._respond(service._ng(f"unknown path {self.path}"), 404)
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                fields = parse_multipart(
                    body, self.headers.get("Content-Type", "")
                )
                filename, payload = fields.get("file", (None, None))
                client_id = self.headers.get("clientID")
                self._respond(service.handle_photo(client_id, filename, payload))
            except Exception as e:
                self._respond(service._ng(repr(e)))

    return Handler


def serve(
    pipeline,
    cfg: Config = Config(),
    root_dir: str = ".",
    host=None,
    port=None,
    warmup: bool = True,
):
    """Blocking server on the reference's port 5001 (`buildAPI.py:233`).

    ``warmup`` runs one dummy tile through the ensemble before accepting
    requests so the first client doesn't pay the XLA compile (the persistent
    compilation cache makes this fast on restarts)."""
    service = DetectionService(pipeline, cfg, root_dir)
    if warmup:
        import numpy as np

        tile = cfg.tiler.tile
        print("warming up (compiling the ensemble)...")
        pipeline.predict_image(np.zeros((tile, tile, 3), np.uint8))
        print("warm.")
    host = host if host is not None else cfg.serve.host
    port = port if port is not None else cfg.serve.port
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    print(f"serving on {host}:{port}")
    httpd.serve_forever()
