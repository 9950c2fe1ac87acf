"""Audio passthrough + clip/concat (reference video_utils.py:137-281
parity). ffmpeg is absent in this image, so the passthrough must degrade
to an explicit recorded status, and clip/concat fall back to cv2
(video-only)."""

import numpy as np
import pytest

from video_enhancer_tpu.io import audio as aud
from video_enhancer_tpu.io.demo import write_demo_video
from video_enhancer_tpu.io.video import get_video_metadata, read_video


@pytest.fixture(scope="module")
def demo_video(tmp_path_factory):
    path = tmp_path_factory.mktemp("aud") / "demo.mp4"
    write_demo_video(path, frames=12, size_hw=(48, 64))
    return path


def test_passthrough_status_without_ffmpeg(demo_video, tmp_path,
                                           monkeypatch):
    out = tmp_path / "out.mp4"
    out.write_bytes(demo_video.read_bytes())
    monkeypatch.setattr(aud.shutil, "which", lambda *_: None)
    assert aud.passthrough_audio(demo_video, out) == "dropped (no ffmpeg)"
    # file untouched
    assert out.read_bytes() == demo_video.read_bytes()


def test_passthrough_no_audio_stream(demo_video, tmp_path):
    if not aud.ffmpeg_available():
        pytest.skip("ffmpeg not installed")
    out = tmp_path / "out.mp4"
    out.write_bytes(demo_video.read_bytes())
    # demo video is cv2-written: no audio stream
    assert aud.passthrough_audio(demo_video, out) == "none"


def test_clip_video_cv2_fallback(demo_video, tmp_path, monkeypatch):
    monkeypatch.setattr(aud.shutil, "which", lambda *_: None)
    out = tmp_path / "clip.mp4"
    meta = get_video_metadata(demo_video)
    assert aud.clip_video(demo_video, out, start_sec=0.0,
                          duration_sec=4.0 / meta.fps)
    assert read_video(out).shape[0] == 4


def test_concat_videos_cv2_fallback(demo_video, tmp_path, monkeypatch):
    monkeypatch.setattr(aud.shutil, "which", lambda *_: None)
    out = tmp_path / "cat.mp4"
    assert aud.concat_videos([demo_video, demo_video], out)
    n = read_video(demo_video).shape[0]
    assert read_video(out).shape[0] == 2 * n


def test_resize_video_cv2_fallback(demo_video, tmp_path, monkeypatch):
    monkeypatch.setattr(aud.shutil, "which", lambda *_: None)
    out = tmp_path / "small.mp4"
    assert aud.resize_video(demo_video, out, width=64, height=48)
    meta = get_video_metadata(out)
    assert (meta.width, meta.height) == (64, 48)


def test_convert_format_cv2_fallback(demo_video, tmp_path, monkeypatch):
    monkeypatch.setattr(aud.shutil, "which", lambda *_: None)
    out = tmp_path / "conv.avi"
    assert aud.convert_format(demo_video, out)
    assert read_video(out).shape[0] == read_video(demo_video).shape[0]


def test_add_subtitles_requires_ffmpeg(demo_video, tmp_path, monkeypatch):
    monkeypatch.setattr(aud.shutil, "which", lambda *_: None)
    srt = tmp_path / "s.srt"
    srt.write_text("1\n00:00:00,000 --> 00:00:01,000\nhi\n")
    assert not aud.add_subtitles(demo_video, srt, tmp_path / "o.mp4")


def test_extract_and_mux_report_false_without_ffmpeg(tmp_path, monkeypatch):
    monkeypatch.setattr(aud.shutil, "which", lambda *_: None)
    assert not aud.ffmpeg_available()
    assert not aud.extract_audio(tmp_path / "a.mp4", tmp_path / "a.m4a")
    assert not aud.mux_audio(tmp_path / "a.mp4", tmp_path / "a.m4a",
                             tmp_path / "o.mp4")
    assert not aud.has_audio_stream(tmp_path / "a.mp4")


# ---------------------------------------------------------------------------
# Real-ffmpeg paths (run in the CI `audio-ffmpeg` job, which installs
# ffmpeg; skipped in images without it). These exercise the branches the
# ffmpeg-less tests above cannot: the passthrough "copied" branch, real
# extract/mux, and soft/burned subtitles. Match:
# reference utils/video_utils.py:137-281.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def av_video(tmp_path_factory):
    """A short video WITH an audio stream, synthesized by ffmpeg lavfi."""
    if not aud.ffmpeg_available():
        pytest.skip("ffmpeg not installed")
    import subprocess

    path = tmp_path_factory.mktemp("av") / "av.mp4"
    rc = subprocess.run(
        ["ffmpeg", "-y", "-v", "error",
         "-f", "lavfi", "-i", "testsrc=duration=1:size=64x48:rate=12",
         "-f", "lavfi", "-i", "sine=frequency=440:duration=1",
         "-c:v", "libx264", "-pix_fmt", "yuv420p", "-c:a", "aac",
         "-shortest", str(path)],
        capture_output=True).returncode
    if rc != 0:
        pytest.skip("ffmpeg lavfi synthesis unavailable")
    return path


def test_has_audio_stream_true(av_video):
    assert aud.has_audio_stream(av_video)


def test_passthrough_copied_branch(av_video, demo_video, tmp_path):
    out = tmp_path / "enhanced.mp4"
    out.write_bytes(demo_video.read_bytes())  # "enhanced" = silent video
    assert aud.passthrough_audio(av_video, out) == "copied"
    assert aud.has_audio_stream(out)
    # video stream survived the mux
    assert read_video(out).shape[0] > 0


def test_extract_then_mux_roundtrip(av_video, demo_video, tmp_path):
    m4a = tmp_path / "a.m4a"
    assert aud.extract_audio(av_video, m4a)
    assert m4a.stat().st_size > 0
    out = tmp_path / "muxed.mp4"
    assert aud.mux_audio(demo_video, m4a, out)
    assert aud.has_audio_stream(out)


def test_clip_video_ffmpeg_keeps_audio(av_video, tmp_path):
    out = tmp_path / "clip.mp4"
    assert aud.clip_video(av_video, out, start_sec=0.0, duration_sec=0.5)
    assert aud.has_audio_stream(out)


def test_add_subtitles_soft_and_burned(av_video, tmp_path):
    srt = tmp_path / "cap tion's.srt"  # space + quote in the path
    srt.write_text("1\n00:00:00,000 --> 00:00:01,000\nhello\n")
    assert aud.add_subtitles(av_video, srt, tmp_path / "soft.mp4")
    assert aud.add_subtitles(av_video, srt, tmp_path / "soft.mkv")
    assert aud.add_subtitles(av_video, srt, tmp_path / "burn.mp4",
                             burn_in=True)
