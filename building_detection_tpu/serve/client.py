"""HTTP client for the detection service.

Rebuild of `/root/reference/CLient/Client.py`: derives a clientID from the
local IP (dots -> underscores, `Client.py:8-24`), posts the image as a
multipart ``file`` field (`Client.py:41-47`), parses the JSON and optionally
saves the base64 result image (`Client.py:50-67`).  Uses urllib so there is
no dependency on ``requests`` (kept optional).
"""
from __future__ import annotations

import base64
import json
import os
import socket
import urllib.request
import uuid
from typing import Optional


def local_client_id() -> str:
    """Local IP with dots replaced by underscores (`Client.py:8-24`)."""
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            s.connect(("8.8.8.8", 80))
            ip = s.getsockname()[0]
        finally:
            s.close()
    except OSError:
        ip = "127.0.0.1"
    return ip.replace(".", "_")


def encode_multipart(field: str, filename: str, payload: bytes):
    boundary = uuid.uuid4().hex
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="{field}"; filename="{filename}"\r\n'
        f"Content-Type: application/octet-stream\r\n\r\n"
    ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


def detect(
    image_path: str,
    url: str = "http://127.0.0.1:5001/photo",
    client_id: Optional[str] = None,
    save_result_to: Optional[str] = None,
    timeout: float = 600.0,
) -> dict:
    """POST an image; returns the parsed JSON response.

    If ``save_result_to`` is given and the response succeeded, the base64
    result image is decoded and written there (`Client.py:56-63`).
    """
    with open(image_path, "rb") as f:
        payload = f.read()
    body, ctype = encode_multipart("file", os.path.basename(image_path), payload)
    req = urllib.request.Request(
        url,
        data=body,
        headers={
            "Content-Type": ctype,
            "clientID": client_id or local_client_id(),
        },
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        data = json.loads(resp.read().decode("utf-8"))
    if save_result_to and data.get("status") == "success" and data.get("data"):
        with open(save_result_to, "wb") as f:
            f.write(base64.b64decode(data["data"]))
    return data


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="bdt-client")
    p.add_argument("image")
    p.add_argument("--url", default="http://127.0.0.1:5001/photo")
    p.add_argument("--save", help="save the returned result image here")
    args = p.parse_args(argv)
    data = detect(args.image, url=args.url, save_result_to=args.save)
    print(json.dumps({k: (v if k != "data" else f"<{len(v or '')} b64 chars>")
                      for k, v in data.items()}, ensure_ascii=False))
    return 0 if data.get("status") == "success" else 1


if __name__ == "__main__":
    raise SystemExit(main())
