"""Robustness: corrupt inputs, concurrent job store, fallback end-to-end."""

import threading

import numpy as np
import pytest


def test_handler_corrupt_video_raises_cleanly(tmp_path):
    from video_enhancer_tpu.runtime.upscaler_handler import CnnUpscalerHandler
    from video_enhancer_tpu.utils.errors import ErrorCode, classify_exception

    bad = tmp_path / "corrupt.mp4"
    bad.write_bytes(b"\x00\x00\x00 ftypisom" + b"\xde\xad" * 100)
    h = CnnUpscalerHandler(use_cnn=False)
    with pytest.raises(Exception) as exc_info:
        h.enhance_video(str(bad), str(tmp_path / "out.mp4"))
    assert classify_exception(exc_info.value) in (
        ErrorCode.INPUT_CORRUPT, ErrorCode.INPUT_NOT_FOUND,
        ErrorCode.SYS_UNKNOWN,
    )


def test_pipeline_falls_back_on_corrupt_then_fails_cleanly(tmp_path):
    from video_enhancer_tpu.runtime.pipeline import run_auto_pipeline

    bad = tmp_path / "corrupt.mp4"
    bad.write_bytes(b"\x00\x00\x00 ftypisom" + b"\xba\xad" * 200)
    with pytest.raises(Exception):
        # both primary and the bicubic fallback fail on an unreadable file
        run_auto_pipeline(str(bad), str(tmp_path / "o.mp4"),
                          engine="bicubic")


def test_jobstore_concurrent_writes(tmp_path):
    from video_enhancer_tpu.runtime.jobstore import JobStore

    store = JobStore(tmp_path / "jobs.sqlite")
    errors = []

    def worker(i):
        try:
            for j in range(10):
                jid = store.create({"status": "queued", "n": i * 100 + j,
                                    "client": f"w{i}"})
                store.update(jid, status="completed")
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert store.counts()["completed"] == 40
    assert store.count_since(3600) == 40
    assert store.count_since(3600, client="w1") == 10


def test_frame_pipeline_propagates_decode_errors(tmp_path):
    from video_enhancer_tpu.io.pipeline import FramePipeline

    with pytest.raises(IOError):
        FramePipeline(str(tmp_path / "nope.mp4"), window=4)


def test_registry_handler_cache_is_singleton():
    from video_enhancer_tpu.runtime.registry import build_handler, clear_cache

    clear_cache()
    a = build_handler("bicubic")
    b = build_handler("bicubic")
    assert a is b
    clear_cache()
    c = build_handler("bicubic")
    assert c is not a
