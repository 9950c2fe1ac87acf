"""Ordered model fallback hierarchies.

Re-creates the reference ``ModelFallbackManager`` (reference
utils/model_fallback.py:71-395): per-model-type ordered candidate lists,
build with timeout + host-memory check, attempt history, and
``load_model_with_fallbacks``. Hierarchies mirror the routing policy's
fallback logic (reference policy_v1.yaml:138-187: vsrm -> rvrt -> realesrgan
etc.).
"""

from __future__ import annotations

import logging
import threading
import time

log = logging.getLogger(__name__)

__all__ = ["ModelFallbackManager", "FALLBACK_HIERARCHIES"]

FALLBACK_HIERARCHIES: dict[str, list[str]] = {
    "vsrm": ["vsrm", "rvrt", "fast_mamba_vsr", "realesrgan", "cnn_upscaler",
             "bicubic"],
    "fast_mamba_vsr": ["fast_mamba_vsr", "realesrgan", "cnn_upscaler",
                       "bicubic"],
    "seedvr2": ["seedvr2", "ditvr", "vsrm", "cnn_upscaler", "bicubic"],
    "ditvr": ["ditvr", "seedvr2", "vsrm", "cnn_upscaler", "bicubic"],
    "rvrt": ["rvrt", "vsrm", "cnn_upscaler", "bicubic"],
    "realesrgan": ["realesrgan", "cnn_upscaler", "bicubic"],
    "cnn_upscaler": ["cnn_upscaler", "bicubic"],
    "bicubic": ["bicubic"],
}


class ModelFallbackManager:
    def __init__(self, policy=None, min_free_host_gb: float = 2.0,
                 build_timeout_sec: float = 600.0):
        self.policy = policy
        self.min_free_host_gb = min_free_host_gb
        self.build_timeout_sec = build_timeout_sec
        self.history: list[dict] = []
        self._lock = threading.Lock()

    def _memory_ok(self) -> bool:
        try:
            import psutil

            return psutil.virtual_memory().available >= \
                self.min_free_host_gb * 1024**3
        except Exception:
            return True

    def _build_with_timeout(self, name: str):
        from .registry import build_handler

        result: dict = {}

        def target():
            try:
                result["handler"] = build_handler(name, self.policy)
            except Exception as e:
                result["error"] = e

        t = threading.Thread(target=target, daemon=True)
        t.start()
        t.join(self.build_timeout_sec)
        if t.is_alive():
            raise TimeoutError(f"building {name} exceeded "
                               f"{self.build_timeout_sec}s")
        if "error" in result:
            raise result["error"]
        return result["handler"]

    def load_model_with_fallbacks(self, model_type: str):
        """Return (handler, name_used). Tries each candidate in order."""
        candidates = FALLBACK_HIERARCHIES.get(model_type, [model_type,
                                                           "bicubic"])
        errors = []
        for name in candidates:
            if not self._memory_ok():
                errors.append(f"{name}: host memory below "
                              f"{self.min_free_host_gb}GB floor")
                continue
            t0 = time.time()
            try:
                handler = self._build_with_timeout(name)
                with self._lock:
                    self.history.append({
                        "requested": model_type, "used": name,
                        "sec": time.time() - t0, "ok": True,
                    })
                if name != model_type:
                    log.warning("model %s unavailable; using fallback %s",
                                model_type, name)
                return handler, name
            except Exception as e:
                errors.append(f"{name}: {e}")
                with self._lock:
                    self.history.append({
                        "requested": model_type, "used": name,
                        "sec": time.time() - t0, "ok": False,
                        "error": str(e),
                    })
        raise RuntimeError(
            f"no model available for {model_type}: {'; '.join(errors)}")

    def get_history(self, limit: int = 50) -> list[dict]:
        with self._lock:
            return list(self.history)[-limit:]
