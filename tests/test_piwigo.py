"""Piwigo storage client against a local mock ws.php server
(reference flow: src/imageio/storage/piwigo.c login/getStatus/
categories/addSimple/uploadCompleted)."""

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from ansel_tpu.library.piwigo import PiwigoClient, PiwigoError


class MockPiwigo(BaseHTTPRequestHandler):
    calls = []  # (method, args-dict-ish) log shared across the test

    def log_message(self, *a):
        pass

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        ctype = self.headers.get("Content-Type", "")
        if ctype.startswith("multipart/form-data"):
            fields = self._parse_multipart(body, ctype)
        else:
            fields = {k: v[0] for k, v in
                      urllib.parse.parse_qs(body.decode()).items()}
        method = fields.get("method", "")
        MockPiwigo.calls.append((method, fields))
        out = {"stat": "ok", "result": {}}
        if method == "pwg.session.login":
            if fields.get("password") != "hunter2":
                out = {"stat": "fail", "message": "bad credentials"}
        elif method == "pwg.session.getStatus":
            out["result"] = {"pwg_token": "tok123"}
        elif method == "pwg.categories.getList":
            out["result"] = {"categories": [
                {"id": 7, "name": "Travel", "fullname": "Travel"}]}
        elif method == "pwg.categories.add":
            out["result"] = {"id": 42}
        elif method == "pwg.images.addSimple":
            assert "__file__" in fields, "upload must carry the image part"
            out["result"] = {"image_id": 1001}
        payload = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    @staticmethod
    def _parse_multipart(body, ctype):
        boundary = ctype.split("boundary=")[1].encode()
        fields = {}
        for part in body.split(b"--" + boundary):
            if b"Content-Disposition" not in part:
                continue
            head, _, val = part.partition(b"\r\n\r\n")
            if b'name="image"' in head:
                fields["__file__"] = val.rstrip(b"\r\n")
            else:
                name = head.split(b'name="')[1].split(b'"')[0].decode()
                fields[name] = val.rstrip(b"\r\n").decode()
        return fields


@pytest.fixture()
def server():
    MockPiwigo.calls = []
    srv = HTTPServer(("127.0.0.1", 0), MockPiwigo)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_login_albums_upload(server, tmp_path):
    client = PiwigoClient(server=server, username="alice",
                          password="hunter2")
    client.login()
    assert client.pwg_token == "tok123"

    albums = client.albums()
    assert [a.name for a in albums] == ["Travel"]

    new_id = client.create_album("Fresh", parent_id=7, private=True)
    assert new_id == 42
    add = dict(MockPiwigo.calls)["pwg.categories.add"]
    assert add["parent"] == "7" and add["status"] == "private"

    img = tmp_path / "shot.jpg"
    img.write_bytes(b"\xff\xd8\xff\xdbjpegdata")
    image_id = client.upload(str(img), album_id=42, name="shot",
                             author="alice", tags="tpu")
    assert image_id == 1001
    methods = [m for m, _ in MockPiwigo.calls]
    assert "pwg.images.uploadCompleted" in methods
    done = dict(MockPiwigo.calls)["pwg.images.uploadCompleted"]
    assert done["pwg_token"] == "tok123"
    up = dict(MockPiwigo.calls)["pwg.images.addSimple"]
    assert up["__file__"].startswith(b"\xff\xd8")
    assert up["category"] == "42" and up["author"] == "alice"


def test_bad_credentials(server):
    client = PiwigoClient(server=server, username="alice",
                          password="wrong")
    with pytest.raises(PiwigoError):
        client.login()


def test_url_normalization():
    assert PiwigoClient(server="piwigo.com", username="bob").url == \
        "https://bob.piwigo.com/ws.php?format=json"
    assert PiwigoClient(server="http://x:1/z", username="b").url == \
        "http://x:1/z/ws.php?format=json"
    assert PiwigoClient(server="gallery.me", username="b").url == \
        "https://gallery.me/ws.php?format=json"
