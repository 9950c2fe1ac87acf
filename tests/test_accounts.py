"""User-account quota (OAuth analog) + external-scanner hook tests
(round-4 verdict "missing" items 2 and 3; reference app.py:1124-1172
per-user quota gating, utils/file_security.py ClamAV hook)."""

import json
import urllib.error
import urllib.request

import pytest


@pytest.fixture()
def api(tmp_path):
    from video_enhancer_tpu.serving.app import ApiServer, create_app
    from video_enhancer_tpu.serving.http import serve

    server = ApiServer(data_dir=str(tmp_path / "data"), worker_threads=1)
    router = create_app(server)
    httpd = serve(router, host="127.0.0.1", port=0, background=True)
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _get(url, key=None):
    headers = {"X-API-Key": key} if key else {}
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def _post(url, payload, key=None):
    headers = {"Content-Type": "application/json"}
    if key:
        headers["X-API-Key"] = key
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def _submit_demo(api, key):
    status, body = _post(api + "/api/v1/demo", {"frames": 4}, key=key)
    return status


def test_me_and_shared_user_quota(api):
    # Anonymous /me: identified by client IP, default quota.
    status, me = _get(api + "/api/v1/me")
    assert status == 200
    assert me["authenticated"] is False
    assert me["remaining_24h"] == me["daily_quota"]

    # Bootstrap admin, then two keys on ONE user account with quota 1.
    status, body = _post(api + "/api/v1/admin/keys",
                         {"name": "root", "role": "admin"})
    assert status == 201
    admin = body["api_key"]
    keys = []
    for kname in ("alice-laptop", "alice-ci"):
        status, body = _post(api + "/api/v1/admin/keys",
                             {"name": kname, "user": "alice",
                              "daily_quota": 1}, key=admin)
        assert status == 201
        keys.append(body["api_key"])

    status, me = _get(api + "/api/v1/me", key=keys[0])
    assert me["user"] == "alice" and me["key_name"] == "alice-laptop"
    assert me["authenticated"] is True

    # One job on key A consumes the ACCOUNT quota; key B is then refused.
    assert _submit_demo(api, keys[0]) == 202
    assert _submit_demo(api, keys[1]) == 429
    status, me = _get(api + "/api/v1/me", key=keys[1])
    assert me["used_24h"] >= 1 and me["remaining_24h"] == 0

    # Admin per-user aggregation sees both keys under one account.
    status, body = _get(api + "/api/v1/admin/users", key=admin)
    assert status == 200
    row = {u["user"]: u for u in body["users"]}["alice"]
    assert sorted(row["keys"]) == ["alice-ci", "alice-laptop"]
    assert row["used_24h"] >= 1


def test_admin_users_requires_admin(api):
    status, _ = _get(api + "/api/v1/admin/users")
    assert status == 403


def test_external_scanner_hook_blocks(tmp_path):
    from video_enhancer_tpu.utils.security import (SecurityConfig,
                                                   SecurityManager,
                                                   SecurityThreat)

    data = b"ftyp" + b"\0" * 2048
    # /bin/false: scanner exit 1 => critical threat, upload blocked.
    sm = SecurityManager(SecurityConfig(scanner_cmd="/bin/false",
                                        min_file_bytes=1))
    out = sm.validate_and_secure_file("a.mp4", data)
    assert out["ok"] is False
    assert any(t["kind"] == "external_scanner" for t in out["threats"])

    # /bin/true: clean scan passes.
    sm = SecurityManager(SecurityConfig(scanner_cmd="/bin/true",
                                        min_file_bytes=1))
    assert sm.validate_and_secure_file("a.mp4", data)["ok"] is True

    # In-process pluggable scanner.
    sm = SecurityManager(SecurityConfig(min_file_bytes=1))
    sm.register_scanner(lambda fn, d: [SecurityThreat(
        "custom", "critical", "nope")] if b"EVIL" in d else [])
    assert sm.validate_and_secure_file("a.mp4", data)["ok"] is True
    out = sm.validate_and_secure_file("a.mp4", data + b"EVIL")
    assert out["ok"] is False

    # A crashing scanner fails CLOSED (scan_error, high severity).
    sm = SecurityManager(SecurityConfig(min_file_bytes=1))
    sm.register_scanner(lambda fn, d: 1 / 0)
    out = sm.validate_and_secure_file("a.mp4", data)
    assert out["ok"] is False
    assert any(t["kind"] == "scan_error" for t in out["threats"])
