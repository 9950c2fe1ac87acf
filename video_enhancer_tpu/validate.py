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


def run_rollback(data_dir: str = "data", git_reset: bool = False) -> dict:
    """Reset a deployment to a known-good state (reference
    validate_deployment.py:637-707 run_rollback). Redesigned: in-flight
    jobs are cancelled through the job store instead of ``pkill -f`` (the
    workers observe the status flip and stop), temp/upload scratch is
    cleared, and the git tracked-file reset — destructive — runs only when
    explicitly requested with ``--git-reset``."""
    import shutil
    import subprocess
    from pathlib import Path

    steps: dict = {}
    try:
        from .runtime.jobstore import JobStatus, JobStore

        store = JobStore(Path(data_dir) / "jobs.sqlite")
        n = 0
        for st in (JobStatus.QUEUED, JobStatus.ANALYZING,
                   JobStatus.PROCESSING):
            for job in store.list(status=st, limit=10000):
                store.update(job["job_id"], status=JobStatus.CANCELLED,
                             error="cancelled by rollback")
                n += 1
        steps["cancel_jobs"] = {"ok": True, "cancelled": n}
    except Exception as e:
        steps["cancel_jobs"] = {"ok": False, "error": str(e)}

    cleaned = []
    for sub in ("tmp", "temp", "uploads"):
        d = Path(data_dir) / sub
        try:
            if d.exists():
                shutil.rmtree(d)
                cleaned.append(str(d))
            d.mkdir(parents=True, exist_ok=True)
        except Exception as e:
            steps.setdefault("clean_errors", []).append(f"{d}: {e}")
    steps["clean_temp"] = {"ok": "clean_errors" not in steps,
                           "cleaned": cleaned}

    if git_reset:
        try:
            r = subprocess.run(["git", "checkout", "--", "."],
                               capture_output=True, text=True, timeout=60)
            steps["git_reset"] = {"ok": r.returncode == 0,
                                  "stderr": r.stderr[-300:]}
        except Exception as e:
            steps["git_reset"] = {"ok": False, "error": str(e)}
    else:
        steps["git_reset"] = {"ok": True, "skipped": "pass --git-reset"}
    steps["ok"] = all(v.get("ok") for v in steps.values()
                      if isinstance(v, dict))
    return steps


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--url", default=None,
                   help="probe a live server at this base URL")
    p.add_argument("--mode", default="full",
                   choices=["full", "ci", "rollback"])
    p.add_argument("--report", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--git-reset", action="store_true",
                   help="rollback only: also git-checkout tracked files")
    args = p.parse_args(argv)

    if args.mode == "rollback":
        steps = run_rollback(args.data_dir, git_reset=args.git_reset)
        out = json.dumps({"rollback": steps}, indent=2, default=str)
        if args.report:
            from pathlib import Path

            Path(args.report).write_text(out)
        print(out)
        return 0 if steps["ok"] else 1

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
