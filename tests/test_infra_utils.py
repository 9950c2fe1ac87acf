"""Infrastructure utils (mirrors reference test_performance_monitor.py,
test_storage_retention.py, test_security_simple.py coverage)."""

import time

import pytest


def test_error_classification_and_handler():
    from video_enhancer_tpu.utils.errors import (
        ErrorCode, ModelError, classify_exception, create_error_response,
        get_error_handler, handle_exceptions,
    )

    assert classify_exception(FileNotFoundError("x")) == \
        ErrorCode.INPUT_NOT_FOUND
    assert classify_exception(ValueError("bad")) == \
        ErrorCode.VAL_INVALID_PARAMS
    assert classify_exception(ModelError("boom")) == \
        ErrorCode.MODEL_FORWARD_FAILED
    assert classify_exception(
        RuntimeError("RESOURCE EXHAUSTED: Out of memory")) == \
        ErrorCode.SYS_OUT_OF_MEMORY

    @handle_exceptions(context="t", default="fallback")
    def boom():
        raise ValueError("nope")

    assert boom() == "fallback"
    stats = get_error_handler().get_stats()
    assert stats["total_errors"] >= 1

    body, status = create_error_response(FileNotFoundError("gone"))
    assert status == 400
    assert body["error"]["code"] == "INPUT_001"


def test_recovery_retry_and_circuit_breaker():
    from video_enhancer_tpu.utils.recovery import (
        CircuitBreaker, CircuitOpenError, RecoveryManager,
        create_fallback_chain, with_recovery,
    )

    calls = {"n": 0}

    @with_recovery(max_retries=3, base_delay=0.01)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3

    breaker = CircuitBreaker(failure_threshold=2, recovery_timeout=0.2,
                             name="t")

    @breaker
    def always_fails():
        raise RuntimeError("down")

    for _ in range(2):
        with pytest.raises(RuntimeError):
            always_fails()
    with pytest.raises(CircuitOpenError):
        always_fails()
    time.sleep(0.25)
    assert breaker.state == "half-open"

    chain = create_fallback_chain(
        lambda: (_ for _ in ()).throw(RuntimeError("a")),
        lambda: "second",
    )
    assert chain() == "second"

    rm = RecoveryManager(max_retries=1, base_delay=0.01)
    with pytest.raises(ValueError):
        rm.run(lambda: (_ for _ in ()).throw(ValueError("always")))
    assert rm.stats["exhausted"] == 1


def test_model_cache_lru():
    from video_enhancer_tpu.utils.memory import ModelCache

    cache = ModelCache(capacity=2)
    cache.put("a", 1)
    cache.put("b", 2)
    assert cache.get("a") == 1  # refresh a
    cache.put("c", 3)  # evicts b
    assert cache.get("b") is None
    assert cache.keys() == ["a", "c"]
    assert cache.stats["evictions"] == 1
    assert cache.get("d", builder=lambda: 4) == 4


def test_temp_file_manager(tmp_path):
    from video_enhancer_tpu.utils.memory import TempFileManager

    tm = TempFileManager()
    p = tmp_path / "x.tmp"
    p.write_text("hi")
    tm.register(p)
    assert tm.cleanup(max_age_sec=9999) == 0
    assert tm.cleanup_all() == 1
    assert not p.exists()


def test_scheduler_runs_tasks():
    from video_enhancer_tpu.runtime.scheduler import BackgroundScheduler

    sched = BackgroundScheduler(poll_sec=0.05)
    hits = []
    sched.add_task("fast", lambda: hits.append(1) or "done", 0.05)
    sched.add_task("startup", lambda: hits.append(2), 9999,
                   run_at_start=True)
    sched.add_task("failing", lambda: 1 / 0, 0.05)
    sched.start()
    time.sleep(0.5)
    sched.stop()
    status = sched.get_status()
    assert status["fast"]["runs"] >= 2
    assert status["startup"]["runs"] == 1
    assert status["failing"]["failures"] >= 1
    assert 2 in hits


def test_storage_retention(tmp_path):
    from video_enhancer_tpu.runtime.storage import (
        RetentionRule, StorageManager,
    )
    import os

    sm = StorageManager(tmp_path, rules=[
        RetentionRule("old_temp", "temp/*", max_age_sec=10),
        RetentionRule("size_cap", "outputs/*", max_total_bytes=100),
    ])
    old = tmp_path / "temp" / "old.bin"
    old.write_bytes(b"x" * 50)
    os.utime(old, (time.time() - 100, time.time() - 100))
    fresh = tmp_path / "temp" / "fresh.bin"
    fresh.write_bytes(b"y" * 50)
    big1 = tmp_path / "outputs" / "a.bin"
    big1.write_bytes(b"a" * 80)
    os.utime(big1, (time.time() - 50, time.time() - 50))
    big2 = tmp_path / "outputs" / "b.bin"
    big2.write_bytes(b"b" * 80)

    dry = sm.apply_retention(dry_run=True)
    assert dry["old_temp"]["deleted"] == 1
    assert old.exists()

    report = sm.apply_retention()
    assert not old.exists()
    assert fresh.exists()
    # size cap 100 with 160 bytes -> oldest output deleted
    assert not big1.exists()
    assert big2.exists()

    usage = sm.get_usage()
    assert usage["total_bytes"] > 0

    digest = sm.index_file(big2)
    assert len(digest) == 64
    assert sm.verify_integrity()["ok"] == 1
    big2.write_bytes(b"tampered")
    assert sm.verify_integrity()["corrupted"]


def test_data_protection_roundtrip(tmp_path):
    from video_enhancer_tpu.utils.protection import DataProtectionManager

    dp = DataProtectionManager(tmp_path / "protected")
    rid = dp.store(b"secret video bytes", category="uploads")
    # encrypted at rest
    blob = (tmp_path / "protected" / f"{rid}.bin").read_bytes()
    assert b"secret" not in blob
    assert dp.retrieve(rid) == b"secret video bytes"
    assert dp.secure_delete(rid)
    assert not dp.secure_delete(rid)
    log = dp.get_audit_log()
    assert [e["action"] for e in log] == ["store", "retrieve", "delete"]


def test_security_manager(tmp_path):
    from video_enhancer_tpu.utils.security import (
        SecurityConfig, SecurityManager,
    )

    sm = SecurityManager(SecurityConfig(min_file_bytes=10))
    ok = sm.validate_and_secure_file(
        "clip.mp4", b"\x00\x00\x00\x20ftypisom" + b"\0" * 100)
    assert ok["ok"], ok

    bad = sm.validate_and_secure_file("../../etc/passwd.mp4", b"ftyp" * 100)
    assert not bad["ok"]
    assert any(t["kind"] == "path_traversal" for t in bad["threats"])

    exe = sm.validate_and_secure_file("x.mp4", b"MZ" + b"\0" * 100)
    assert not exe["ok"]

    status = sm.get_security_status()
    assert status["event_counts"]["file_blocked"] == 2

    assert sm.check_rate_limit("client1")


def test_structured_logging_and_ring_buffer(tmp_path):
    import json
    import logging

    from video_enhancer_tpu.utils.logging_config import (
        RequestContext, StructuredFormatter, get_ring_buffer,
    )

    fmt = StructuredFormatter()
    rec = logging.LogRecord("t", logging.INFO, "f", 1, "hello %s", ("x",),
                            None)
    entry = json.loads(fmt.format(rec))
    assert entry["message"] == "hello x"
    assert entry["level"] == "INFO"

    ring = get_ring_buffer()
    logging.getLogger("ringtest").warning("visible in ring")
    assert any("visible in ring" in line for line in ring.tail())

    with RequestContext("req42"):
        rec2 = logging.LogRecord("t", logging.INFO, "f", 1, "m", (), None)
        for f in logging.getLogger().filters:
            f.filter(rec2)
        assert rec2.ctx["request_id"] == "req42"


def test_profiler_trace_hook(tmp_path):
    """profile=True wraps the op in a jax.profiler trace and records the
    trace directory (SURVEY §5 tracing)."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.utils.perf import PerformanceTracker

    tracker = PerformanceTracker()
    op = tracker.start_operation("traced_op", "test", profile=True,
                                 trace_dir=str(tmp_path))
    jnp.sum(jnp.ones((8, 8))).block_until_ready()
    rec = tracker.finish_operation(op, success=True)
    tdir = rec["meta"].get("trace_dir")
    if "trace_error" in rec["meta"]:
        import pytest

        pytest.skip(f"profiler unavailable: {rec['meta']['trace_error']}")
    import pathlib

    files = list(pathlib.Path(tdir).rglob("*"))
    assert any(f.is_file() for f in files), "no trace artifact written"
