#!/usr/bin/env python3
"""Add (or verify) SPDX license headers on package Python sources.

Parity with the reference's scripts/add_license_headers.py (222 LoC that
splices a 38-line MIT docstring into each file), redesigned: a one-line
``# SPDX-License-Identifier: MIT`` marker — machine-readable, idempotent,
and diff-friendly — inserted after any shebang/coding line, with a
``--check`` mode for CI that fails when files are missing the marker.

Usage:
  python scripts/add_license_headers.py [--check] [paths...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

MARKER = "# SPDX-License-Identifier: MIT"
DEFAULT_ROOTS = ["video_enhancer_tpu", "scripts", "tests"]
LEGACY_HINTS = ("spdx-license-identifier", "mit license", "copyright (c)")


def has_header(text: str) -> bool:
    head = "\n".join(text.splitlines()[:20]).lower()
    return any(h in head for h in LEGACY_HINTS)


def insert_at(text: str) -> int:
    """Line index after shebang and coding declarations."""
    lines = text.splitlines(keepends=True)
    i = 0
    while i < len(lines) and (
            lines[i].startswith("#!") or "coding" in lines[i][:20]):
        i += 1
    return sum(len(ln) for ln in lines[:i])


def process(path: Path, check: bool) -> bool:
    """Returns True when the file already had (or now has) the header."""
    text = path.read_text(encoding="utf-8")
    if has_header(text):
        return True
    if check:
        return False
    pos = insert_at(text)
    path.write_text(text[:pos] + MARKER + "\n" + text[pos:],
                    encoding="utf-8")
    return True


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("paths", nargs="*", default=None)
    p.add_argument("--check", action="store_true",
                   help="fail (exit 1) listing files missing a header; "
                        "modify nothing")
    args = p.parse_args(argv)

    repo = Path(__file__).resolve().parent.parent
    roots = [Path(x) for x in (args.paths or
                               [repo / r for r in DEFAULT_ROOTS])]
    missing = []
    n = 0
    for root in roots:
        files = [root] if root.is_file() else sorted(root.rglob("*.py"))
        for f in files:
            n += 1
            if not process(f, args.check):
                try:
                    missing.append(str(f.relative_to(repo)))
                except ValueError:
                    missing.append(str(f))
    if args.check and missing:
        print(f"{len(missing)}/{n} files missing license header:")
        print("\n".join(f"  {m}" for m in missing))
        return 1
    print(f"{'checked' if args.check else 'ensured'} license header on "
          f"{n} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
