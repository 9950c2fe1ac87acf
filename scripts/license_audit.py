#!/usr/bin/env python
"""License audit (reference scripts/license_audit.py:46-407 equivalent).

Audits (a) the model registry's license gates in the policy and (b) installed
python dependencies' license metadata, writing AUDIT_LICENSE_REPORT.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PERMISSIVE = {"apache-2.0", "mit", "bsd-3-clause", "bsd-2-clause", "isc",
              "apache software license", "bsd license", "mit license",
              "python software foundation license"}


def audit_models() -> dict:
    from video_enhancer_tpu.config import default_policy

    policy = default_policy()
    out = {}
    for name, entry in policy.models.items():
        lic = entry.license.lower()
        out[name] = {
            "license": entry.license,
            "enabled": entry.enabled,
            "permissive": lic in PERMISSIVE,
            "violation": entry.enabled and lic not in PERMISSIVE,
        }
    return out


def audit_dependencies() -> dict:
    import importlib.metadata as md

    out = {}
    for dist in md.distributions():
        name = dist.metadata.get("Name", "unknown")
        lic = (dist.metadata.get("License-Expression")
               or dist.metadata.get("License") or "")
        if not lic or len(lic) > 120:
            for c in dist.metadata.get_all("Classifier") or []:
                if c.startswith("License ::"):
                    lic = c.split("::")[-1].strip()
                    break
        out[name] = {
            "license": lic or "unknown",
            "permissive": lic.lower() in PERMISSIVE if lic else None,
        }
    return out


def main():
    report = {
        "models": audit_models(),
        "dependencies": audit_dependencies(),
    }
    violations = [n for n, rec in report["models"].items()
                  if rec["violation"]]
    report["model_violations"] = violations
    report["status"] = "pass" if not violations else "fail"
    out_path = Path(__file__).resolve().parents[1] / \
        "AUDIT_LICENSE_REPORT.json"
    out_path.write_text(json.dumps(report, indent=2))
    print(f"{report['status']}: {len(report['dependencies'])} deps audited, "
          f"{len(violations)} model license violations -> {out_path}")
    return 0 if not violations else 1


if __name__ == "__main__":
    raise SystemExit(main())
