"""Deployment + model validation.

Re-creates the reference validation pair (reference validate_deployment.py:
52-852: health/metrics/readiness probes, model availability, device memory,
filesystem, config — report + CI mode; and validate_models.py:22-308:
dependency/model-structure/import checks -> JSON report).

Run: ``python -m video_enhancer_tpu.validate [--url http://host:port]
[--mode ci] [--report out.json]``
"""

from __future__ import annotations

import argparse
import json
import time


def validate_imports() -> dict:
    checks = {}
    for mod in ("jax", "cv2", "numpy", "yaml", "psutil", "optax", "orbax.checkpoint"):
        try:
            __import__(mod)
            checks[mod] = "ok"
        except Exception as e:
            checks[mod] = f"missing: {e}"
    return checks


def validate_models() -> dict:
    from .runtime.registry import probe_available

    from .config import default_policy

    policy = default_policy()
    avail = probe_available(policy)
    return {
        name: {"enabled": policy.models[name].enabled,
               "importable": name in avail}
        for name in policy.models
    }


def validate_model_structures() -> dict:
    """Tiny-shape forward of every backbone (reference validate_models.py
    structure checks)."""
    import jax
    import jax.numpy as jnp

    out = {}
    clip = jnp.zeros((1, 2, 16, 16, 3))
    checks = {
        "fast_mamba_vsr": lambda: _fwd_fmv(clip),
        "vsrm": lambda: _fwd_vsrm(clip),
        "ditvr": lambda: _fwd_ditvr(clip),
        "seedvr2": lambda: _fwd_seedvr2(clip),
        "rvrt": lambda: _fwd_rvrt(clip),
    }
    for name, fn in checks.items():
        t0 = time.time()
        try:
            shape = fn()
            out[name] = {"ok": True, "out_shape": list(shape),
                         "sec": round(time.time() - t0, 2)}
        except Exception as e:
            out[name] = {"ok": False, "error": str(e)}
    return out


def _fwd_fmv(clip):
    import jax

    from .models import fast_mamba_vsr as m

    p, _ = m.init(jax.random.PRNGKey(0), dim=8, num_layers=1)
    return m.apply(p, clip, scale=4).shape


def _fwd_vsrm(clip):
    import jax

    from .models import vsrm as m

    p, _ = m.init(jax.random.PRNGKey(0), dim=8, num_blocks=1, heads=2)
    return m.apply(p, clip, scale=4, heads=2).shape


def _fwd_ditvr(clip):
    import jax

    from .models import ditvr as m

    p, _ = m.init(jax.random.PRNGKey(0), dim=32, depth=1, heads=2)
    return m.apply(p, clip).shape


def _fwd_seedvr2(clip):
    import jax

    from .models import seedvr2 as m

    p, _ = m.init(jax.random.PRNGKey(0), base_channels=8, channel_mult=(1, 2))
    return m.apply(p, clip).shape


def _fwd_rvrt(clip):
    import jax

    from .models import rvrt as m

    p, _ = m.init(jax.random.PRNGKey(0), dim=8, depth=1, heads=2,
                  window=(2, 4, 4), scale=2)
    return m.apply(p, clip, scale=2, heads=2, window=(2, 4, 4)).shape


def validate_device() -> dict:
    try:
        import jax

        devs = jax.devices()
        from .utils.memory import DeviceMemoryManager

        return {"backend": jax.default_backend(),
                "devices": [str(d) for d in devs],
                "memory": DeviceMemoryManager.get_info()}
    except Exception as e:
        return {"error": str(e)}


def validate_server(url: str) -> dict:
    import urllib.request

    checks = {}
    for path in ("/health", "/metrics", "/api/v1/strategies",
                 "/performance/stats"):
        try:
            with urllib.request.urlopen(url + path, timeout=10) as resp:
                checks[path] = {"status": resp.status,
                                "ok": resp.status == 200}
        except Exception as e:
            checks[path] = {"ok": False, "error": str(e)}
    return checks


def validate_filesystem(data_dir: str = "data") -> dict:
    import shutil
    from pathlib import Path

    p = Path(data_dir)
    try:
        p.mkdir(parents=True, exist_ok=True)
        test = p / ".write_test"
        test.write_text("x")
        test.unlink()
        free = shutil.disk_usage(p).free
        return {"writable": True, "free_gb": round(free / 1024**3, 1)}
    except Exception as e:
        return {"writable": False, "error": str(e)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--url", default=None,
                   help="probe a live server at this base URL")
    p.add_argument("--mode", default="full", choices=["full", "ci"])
    p.add_argument("--report", default=None)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    from .utils.jaxenv import setup

    setup(platform=args.platform)

    report = {
        "timestamp": time.time(),
        "imports": validate_imports(),
        "models": validate_models(),
        "device": validate_device(),
        "filesystem": validate_filesystem(),
    }
    if args.mode == "full":
        report["model_structures"] = validate_model_structures()
    if args.url:
        report["server"] = validate_server(args.url)

    failures = []
    for mod, status in report["imports"].items():
        if status != "ok":
            failures.append(f"import {mod}: {status}")
    for name, rec in report.get("model_structures", {}).items():
        if not rec["ok"]:
            failures.append(f"model {name}: {rec['error']}")
    if not report["filesystem"].get("writable"):
        failures.append("filesystem not writable")
    for path, rec in report.get("server", {}).items():
        if not rec.get("ok"):
            failures.append(f"server {path}")

    report["failures"] = failures
    report["status"] = "pass" if not failures else "fail"
    out = json.dumps(report, indent=2, default=str)
    if args.report:
        from pathlib import Path

        Path(args.report).write_text(out)
    print(out)
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
