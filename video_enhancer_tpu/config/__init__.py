"""Config loading: YAML policy -> typed tree, with env-var overrides.

Replaces reference config/model_config.py (import-broken, reference
config/model_config.py:76) and the never-loaded policy YAML.
"""

from __future__ import annotations

import functools
import os
import pathlib
from typing import Any

import yaml

from .types import (
    DegradationThresholds,
    LatencyBudget,
    LatencyClass,
    MeshConfig,
    ModelEntry,
    ModelKind,
    PipelineDefaults,
    Policy,
    QualityGates,
)

__all__ = [
    "DegradationThresholds",
    "LatencyBudget",
    "LatencyClass",
    "MeshConfig",
    "ModelEntry",
    "ModelKind",
    "PipelineDefaults",
    "Policy",
    "QualityGates",
    "load_policy",
    "default_policy",
    "DEFAULT_POLICY_PATH",
]

DEFAULT_POLICY_PATH = pathlib.Path(__file__).parent / "policy_v1.yaml"


def _parse_models(raw: dict[str, Any]) -> dict[str, ModelEntry]:
    models: dict[str, ModelEntry] = {}
    for name, m in raw.items():
        m = dict(m or {})
        weights_env = m.get("weights_env")
        weights_path = m.get("weights_path")
        # Env var (mirrors the reference's VSRM_DIR/SEEDVR2_3B_DIR override
        # chain, reference vsrm_handler.py:260-410) wins over the policy path.
        if weights_env and os.environ.get(weights_env):
            weights_path = os.environ[weights_env]
        models[name] = ModelEntry(
            name=name,
            license=m.get("license", "apache-2.0"),
            enabled=bool(m.get("enabled", True)),
            weights_path=weights_path,
            weights_env=weights_env,
            scale=int(m.get("scale", 4)),
            window=int(m.get("window", 7)),
            stride=int(m.get("stride", 3)),
            chunk=int(m.get("chunk", 16)),
            overlap=int(m.get("overlap", 2)),
            tile=int(m.get("tile", 512)),
            tile_overlap=int(m.get("tile_overlap", 32)),
            extra=dict(m.get("extra", {})),
        )
    return models


def load_policy(path: str | os.PathLike | None = None) -> Policy:
    """Load and validate the policy file into the typed tree."""
    path = pathlib.Path(path or os.environ.get("VETPU_POLICY", DEFAULT_POLICY_PATH))
    raw = yaml.safe_load(path.read_text())

    thr = DegradationThresholds(**raw.get("degradation_thresholds", {}))

    budgets = {}
    for name, b in raw.get("latency_budgets", {}).items():
        budgets[name] = LatencyBudget(
            max_ms_per_frame=float(b["max_ms_per_frame"]),
            max_memory_gb=float(b["max_memory_gb"]),
            max_resolution=tuple(b["max_resolution"]),
        )
    for lc in LatencyClass:
        if lc.value not in budgets:
            raise ValueError(f"policy missing latency budget for {lc.value!r}")

    gates = QualityGates(**raw.get("quality_gates", {}))

    d = dict(raw.get("defaults", {}))
    if "latency_class" in d:
        d["latency_class"] = LatencyClass(d["latency_class"])
    defaults = PipelineDefaults(**d)

    mesh = MeshConfig(**raw.get("mesh", {}))
    models = _parse_models(raw.get("models", {}))

    return Policy(
        version=str(raw.get("version", "unknown")),
        thresholds=thr,
        latency_budgets=budgets,
        quality_gates=gates,
        models=models,
        defaults=defaults,
        mesh=mesh,
    )


@functools.lru_cache(maxsize=None)
def default_policy() -> Policy:
    return load_policy()
