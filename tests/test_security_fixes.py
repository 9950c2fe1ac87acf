"""Security/robustness hardening tests: admin-bootstrap localhost gate,
per-client job ownership, per-key rate limits, early Content-Length cap,
CORS/GZip middleware, and torch-checkpoint norm/Conv1d conversion."""

import gzip
import http.client
import json

import numpy as np
import pytest


def _multipart(fields):
    boundary = "secbound"
    chunks = []
    for name, value in fields.items():
        chunks.append(f"--{boundary}\r\n".encode())
        if isinstance(value, tuple):
            fname, data = value
            chunks.append(
                f'Content-Disposition: form-data; name="{name}"; '
                f'filename="{fname}"\r\nContent-Type: video/mp4\r\n\r\n'
                .encode())
            chunks.append(data)
            chunks.append(b"\r\n")
        else:
            chunks.append(
                f'Content-Disposition: form-data; name="{name}"\r\n\r\n'
                f"{value}\r\n".encode())
    chunks.append(f"--{boundary}--\r\n".encode())
    return (b"".join(chunks),
            f"multipart/form-data; boundary={boundary}")


@pytest.fixture(scope="module")
def app(tmp_path_factory):
    from video_enhancer_tpu.serving.app import ApiServer, create_app

    server = ApiServer(data_dir=str(tmp_path_factory.mktemp("secdata")),
                       worker_threads=1, start_scheduler=False)
    return create_app(server)


def _req(method, path, client, body=b"", ctype=None, headers=None):
    from video_enhancer_tpu.serving.http import Request

    h = {k.lower(): v for k, v in (headers or {}).items()}
    if ctype:
        h["content-type"] = ctype
    return Request(method, path, {}, h, body, client=client)


@pytest.fixture(scope="module")
def demo_bytes(tmp_path_factory):
    from video_enhancer_tpu.io.demo import write_demo_video

    path = tmp_path_factory.mktemp("sv") / "demo.mp4"
    write_demo_video(path, frames=6, size_hw=(48, 64))
    return path.read_bytes()


def test_admin_bootstrap_localhost_only(app):
    body = json.dumps({"name": "evil", "role": "admin"}).encode()
    resp = app.dispatch(_req("POST", "/api/v1/admin/keys", "203.0.113.7",
                             body, "application/json"))
    assert resp.status == 403
    assert b"localhost" in resp.data

    resp = app.dispatch(_req("POST", "/api/v1/admin/keys", "127.0.0.1",
                             json.dumps({"name": "root",
                                         "role": "admin"}).encode(),
                             "application/json"))
    assert resp.status == 201
    admin_key = json.loads(resp.data)["api_key"]

    # Once a key exists, even localhost must authenticate as admin.
    resp = app.dispatch(_req("POST", "/api/v1/admin/keys", "127.0.0.1",
                             json.dumps({"name": "x"}).encode(),
                             "application/json"))
    assert resp.status == 403
    resp = app.dispatch(_req("POST", "/api/v1/admin/keys", "127.0.0.1",
                             json.dumps({"name": "user2",
                                         "rate_limit": 2}).encode(),
                             "application/json",
                             headers={"X-API-Key": admin_key}))
    assert resp.status == 201
    app.server._admin_key_for_tests = admin_key


def test_job_ownership_isolation(app, demo_bytes):
    body, ctype = _multipart({"file": ("own.mp4", demo_bytes),
                              "vsr_strategy": "bicubic"})
    resp = app.dispatch(_req("POST", "/api/v1/process/auto", "10.0.0.1",
                             body, ctype))
    assert resp.status == 202, resp.data
    job_id = json.loads(resp.data)["job_id"]

    # Another anonymous client must not see, download, or delete the job.
    for path in (f"/api/v1/job/{job_id}", f"/api/v1/job/{job_id}/download"):
        resp = app.dispatch(_req("GET", path, "10.0.0.2"))
        assert resp.status == 404, path
    resp = app.dispatch(_req("DELETE", f"/api/v1/job/{job_id}", "10.0.0.2"))
    assert resp.status == 404
    listed = json.loads(app.dispatch(
        _req("GET", "/api/v1/jobs", "10.0.0.2")).data)["jobs"]
    assert all(j["job_id"] != job_id for j in listed)

    # The owner sees it; an admin key sees everything.
    resp = app.dispatch(_req("GET", f"/api/v1/job/{job_id}", "10.0.0.1"))
    assert resp.status == 200
    admin_key = getattr(app.server, "_admin_key_for_tests", None)
    if admin_key:
        resp = app.dispatch(_req("GET", f"/api/v1/job/{job_id}", "10.0.0.9",
                                 headers={"X-API-Key": admin_key}))
        assert resp.status == 200


def test_per_key_rate_limit_enforced(tmp_path):
    from video_enhancer_tpu.utils.auth import AuthManager

    auth = AuthManager(tmp_path / "keys.json")
    key = auth.create_key("tiny", rate_limit=2)
    rec = auth.authenticate(key)
    assert auth.check_rate(rec, "1.1.1.1")
    assert auth.check_rate(rec, "1.1.1.1")
    assert not auth.check_rate(rec, "1.1.1.1")

    # Anonymous buckets are per-IP: exhausting one IP leaves others intact.
    anon = auth.authenticate(None, "2.2.2.2")
    small = dict(anon, rate_limit=1)
    assert auth.check_rate(small, "2.2.2.2")
    assert not auth.check_rate(small, "2.2.2.2")
    assert auth.check_rate(small, "3.3.3.3")


@pytest.fixture(scope="module")
def live(app):
    from video_enhancer_tpu.serving.http import serve

    httpd = serve(app, host="127.0.0.1", port=0, background=True)
    yield httpd.server_address
    httpd.shutdown()


def test_oversized_content_length_rejected_without_read(live):
    host, port = live
    conn = http.client.HTTPConnection(host, port, timeout=10)
    # Declare a 2 GB body but send none: the server must answer 413 from the
    # header alone instead of buffering.
    conn.putrequest("POST", "/api/v1/process/auto")
    conn.putheader("Content-Length", str(2 * 1024 * 1024 * 1024))
    conn.putheader("Content-Type", "application/octet-stream")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 413
    assert b"too large" in resp.read()
    conn.close()


def test_cors_and_options_preflight(live):
    host, port = live
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("OPTIONS", "/api/v1/jobs")
    resp = conn.getresponse()
    assert resp.status == 204
    assert resp.getheader("Access-Control-Allow-Origin") == "*"
    assert "POST" in resp.getheader("Access-Control-Allow-Methods")
    resp.read()
    conn.request("GET", "/health")
    resp = conn.getresponse()
    assert resp.getheader("Access-Control-Allow-Origin") == "*"
    resp.read()
    conn.close()


def test_gzip_negotiated(live):
    host, port = live
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("GET", "/api/v1/strategies",
                 headers={"Accept-Encoding": "gzip"})
    resp = conn.getresponse()
    raw = resp.read()
    if resp.getheader("Content-Encoding") == "gzip":
        body = json.loads(gzip.decompress(raw))
    else:  # body under the compression threshold
        body = json.loads(raw)
    assert "strategies" in body
    conn.close()


def test_torch_norm_bias_and_conv1d_conversion():
    from video_enhancer_tpu.nn.core import layer_norm_init
    from video_enhancer_tpu.runtime.weights import (convert_torch_state_dict,
                                                    unflatten_into)

    dim, k, cin, cout = 6, 3, 4, 5
    sd = {
        "norm.weight": np.arange(dim, dtype=np.float32),
        "norm.bias": np.arange(dim, dtype=np.float32) + 100,
        "dw.weight": np.arange(cout * cin * k,
                               dtype=np.float32).reshape(cout, cin, k),
    }
    flat = convert_torch_state_dict(sd)
    assert flat["norm.bias"].tolist() == flat["norm.b"].tolist()
    assert flat["dw.w"].shape == (k, cin, cout)
    # value check: torch (out,in,k) index [o,i,t] must land at ours [t,i,o]
    torch_w = sd["dw.weight"]
    assert flat["dw.w"][1, 2, 3] == torch_w[3, 2, 1]

    template = {"norm": layer_norm_init(dim)}
    loaded, matched, _ = unflatten_into(template, flat)
    assert set(matched) == {"norm.scale", "norm.bias"}
    assert float(loaded["norm"]["bias"][0]) == 100.0
