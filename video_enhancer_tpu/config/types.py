"""Typed configuration tree.

The reference keeps its routing policy in ``config/policy_v1.yaml`` but never
loads it (the router hardcodes equivalent values, reference
models/analysis/degradation_router.py:57-64, 493-518) and its ``ModelConfig``
module cannot even be imported (reference config/model_config.py:76 has an
IndentationError). Here the policy file is the single source of truth: it is
parsed into the frozen dataclasses below at startup and handed to the router,
the handlers and the serving layer.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Mapping


class LatencyClass(str, enum.Enum):
    STRICT = "strict"
    STANDARD = "standard"
    FLEXIBLE = "flexible"


class ModelKind(str, enum.Enum):
    VSRM = "vsrm"
    SEEDVR2 = "seedvr2"
    DITVR = "ditvr"
    FAST_MAMBA_VSR = "fast_mamba_vsr"
    RVRT = "rvrt"
    REALESRGAN = "realesrgan"
    CNN_UPSCALER = "cnn_upscaler"
    BICUBIC = "bicubic"


@dataclasses.dataclass(frozen=True)
class DegradationThresholds:
    """Score thresholds driving expert/model selection.

    Mirrors reference degradation_router.py:57-64.
    """

    compression: float = 0.6
    motion_blur: float = 0.5
    low_light: float = 0.6
    noise: float = 0.4
    face_prominence: float = 0.03
    motion_complexity: float = 0.7
    unknown_degradation: float = 0.6


@dataclasses.dataclass(frozen=True)
class LatencyBudget:
    """Per latency class budgets (reference policy_v1.yaml:123-146, 265-275)."""

    max_ms_per_frame: float
    max_memory_gb: float
    max_resolution: tuple[int, int]  # (H, W)


@dataclasses.dataclass(frozen=True)
class QualityGates:
    """Minimum acceptable output quality (reference policy_v1.yaml:236-261)."""

    min_psnr: float = 25.0
    min_ssim: float = 0.8
    min_vmaf: float = 70.0
    escalate_on_failure: bool = True


@dataclasses.dataclass(frozen=True)
class ModelEntry:
    """One model in the registry (reference config/model_registry.json:1-75)."""

    name: str
    license: str = "apache-2.0"
    enabled: bool = True
    weights_path: str | None = None
    weights_env: str | None = None
    scale: int = 4
    window: int = 7
    stride: int = 3
    chunk: int = 16
    overlap: int = 2
    tile: int = 512
    tile_overlap: int = 32
    extra: Mapping[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Named device mesh for SPMD execution.

    Axes: ``data`` (frame-batch DP), ``time`` (temporal context parallel with
    halo exchange), ``space`` (spatial sharding of H for 4K+). The reference is
    single-device (SURVEY.md §2.7); this is the TPU-native replacement for its
    batching/chunking/tiling trio.
    """

    data: int = 1
    time: int = 1
    space: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.time * self.space


@dataclasses.dataclass(frozen=True)
class PipelineDefaults:
    """Defaults for the processing pipeline."""

    latency_class: LatencyClass = LatencyClass.STANDARD
    allow_diffusion: bool = True
    allow_zero_shot: bool = True
    license_mode: str = "permissive"
    enable_face_expert: bool = False
    enable_hfr: bool = False
    enable_temporal_smoothing: bool = False
    output_codec: str = "mp4v"
    compute_dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class Policy:
    """Root of the loaded policy tree."""

    version: str
    thresholds: DegradationThresholds
    latency_budgets: Mapping[str, LatencyBudget]
    quality_gates: QualityGates
    models: Mapping[str, ModelEntry]
    defaults: PipelineDefaults
    mesh: MeshConfig

    def model(self, name: str) -> ModelEntry:
        return self.models[name]

    def enabled_models(self) -> list[str]:
        return [m.name for m in self.models.values() if m.enabled]

    def budget(self, latency_class: LatencyClass | str) -> LatencyBudget:
        key = (
            latency_class.value
            if isinstance(latency_class, LatencyClass)
            else str(latency_class)
        )
        return self.latency_budgets[key]
