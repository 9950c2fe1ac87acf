"""Memory management: device stats, LRU model cache, temp files, host RAM.

Re-creates the reference memory subsystem (reference utils/memory_manager.py):
device memory info/cleanup (:44-170, torch.cuda -> jax device memory_stats),
``ModelCache`` LRU of <= 3 models (:172-241), system-memory monitor
(:243-334), ``TemporaryFileManager`` age-based cleanup (:336-389) and the
facade with routine/emergency cleanup (:391-486).
"""

from __future__ import annotations

import collections
import gc
import logging
import threading
import time
from pathlib import Path
from typing import Any, Callable

log = logging.getLogger(__name__)

__all__ = ["DeviceMemoryManager", "ModelCache", "TempFileManager",
           "MemoryManager", "get_memory_manager"]


class DeviceMemoryManager:
    """TPU/accelerator memory via jax device memory_stats."""

    @staticmethod
    def get_info() -> dict:
        try:
            import jax

            dev = jax.local_devices()[0]
            stats = dev.memory_stats() or {}
            limit = stats.get("bytes_limit", 0)
            used = stats.get("bytes_in_use", 0)
            return {
                "device": str(dev),
                "bytes_in_use": used,
                "bytes_limit": limit,
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
                "utilization": used / limit if limit else 0.0,
            }
        except Exception as e:
            return {"error": str(e)}

    @staticmethod
    def cleanup() -> None:
        """Drop cached executables/buffers where possible."""
        gc.collect()
        try:
            import jax

            jax.clear_caches()
        except Exception:
            pass


class ModelCache:
    """LRU cache of built handlers/params, capacity 3 (reference
    memory_manager.py:172-241)."""

    def __init__(self, capacity: int = 3):
        self.capacity = capacity
        self._od: collections.OrderedDict[str, Any] = collections.OrderedDict()
        self._lock = threading.Lock()
        self.stats = {"hits": 0, "misses": 0, "evictions": 0}

    def get(self, key: str, builder: Callable[[], Any] | None = None):
        with self._lock:
            if key in self._od:
                self._od.move_to_end(key)
                self.stats["hits"] += 1
                return self._od[key]
            self.stats["misses"] += 1
        if builder is None:
            return None
        value = builder()
        self.put(key, value)
        return value

    def put(self, key: str, value: Any) -> None:
        with self._lock:
            self._od[key] = value
            self._od.move_to_end(key)
            while len(self._od) > self.capacity:
                evicted, _ = self._od.popitem(last=False)
                self.stats["evictions"] += 1
                log.info("model cache evicted %s", evicted)

    def clear(self) -> None:
        with self._lock:
            self._od.clear()

    def keys(self) -> list[str]:
        with self._lock:
            return list(self._od)


class TempFileManager:
    """Track temp files; delete by age (reference memory_manager.py:336-389)."""

    def __init__(self):
        self._files: dict[str, float] = {}
        self._lock = threading.Lock()

    def register(self, path) -> str:
        with self._lock:
            self._files[str(path)] = time.time()
        return str(path)

    def cleanup(self, max_age_sec: float = 3600.0) -> int:
        now = time.time()
        removed = 0
        with self._lock:
            items = list(self._files.items())
        for path, created in items:
            if now - created > max_age_sec or not Path(path).exists():
                Path(path).unlink(missing_ok=True)
                with self._lock:
                    self._files.pop(path, None)
                removed += 1
        return removed

    def cleanup_all(self) -> int:
        return self.cleanup(max_age_sec=0.0)


class MemoryManager:
    """Facade: routine + emergency cleanup (reference memory_manager.py:391-486)."""

    def __init__(self, host_threshold_pct: float = 90.0):
        self.device = DeviceMemoryManager()
        self.model_cache = ModelCache()
        self.temp_files = TempFileManager()
        self.host_threshold_pct = host_threshold_pct

    def host_info(self) -> dict:
        try:
            import psutil

            vm = psutil.virtual_memory()
            return {"total": vm.total, "available": vm.available,
                    "percent": vm.percent}
        except Exception as e:
            return {"error": str(e)}

    def check_pressure(self) -> bool:
        info = self.host_info()
        return info.get("percent", 0) >= self.host_threshold_pct

    def routine_cleanup(self) -> dict:
        removed = self.temp_files.cleanup()
        gc.collect()
        return {"temp_files_removed": removed}

    def emergency_cleanup(self) -> dict:
        removed = self.temp_files.cleanup_all()
        self.model_cache.clear()
        self.device.cleanup()
        return {"temp_files_removed": removed, "model_cache_cleared": True}

    def get_status(self) -> dict:
        return {
            "device": self.device.get_info(),
            "host": self.host_info(),
            "model_cache": {"keys": self.model_cache.keys(),
                            **self.model_cache.stats},
        }


_mm: MemoryManager | None = None
_mm_lock = threading.Lock()


def get_memory_manager() -> MemoryManager:
    global _mm
    with _mm_lock:
        if _mm is None:
            _mm = MemoryManager()
        return _mm
