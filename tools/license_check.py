#!/usr/bin/env python3
"""Enforce the license header policy on source files.

Replaces the reference's license gate (license-check.py:8-20, run in CI
at .github/workflows/main.yml:73-74): every first-party source file must
start with a module docstring/comment (our header convention), and any
file carrying an explicit license identifier must use Apache-2.0.
"""

import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SOURCE_GLOBS = ["zeth_tpu/**/*.py", "tests/**/*.py", "*.py",
                "zeth_tpu/**/*.cpp"]
SKIP = {"__init__.py"}

BAD_LICENSES = re.compile(r"GPL|AGPL|LGPL|Proprietary", re.IGNORECASE)


def check(path: pathlib.Path) -> list[str]:
    text = path.read_text(errors="replace")
    problems = []
    head = text[:4000]
    if BAD_LICENSES.search(head):
        problems.append(f"{path}: disallowed license identifier in header")
    stripped = text.lstrip()
    if path.suffix == ".py" and path.name not in SKIP:
        if not (stripped.startswith('"""') or stripped.startswith("#")
                or not stripped):
            problems.append(f"{path}: missing module docstring/header")
    if path.suffix == ".cpp":
        if not stripped.startswith("//"):
            problems.append(f"{path}: missing header comment")
    return problems


def main() -> int:
    problems = []
    for g in SOURCE_GLOBS:
        for p in sorted(ROOT.glob(g)):
            if ".jax_cache" in str(p) or "csrc/build" in str(p):
                continue
            problems += check(p)
    for p in problems:
        print(p, file=sys.stderr)
    print(f"license-check: {'FAIL' if problems else 'OK'}")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
