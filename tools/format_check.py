#!/usr/bin/env python
"""Offline format gate (CI `lint` job + runnable anywhere).

The reference CI formats/lints every source and markdown file (rustfmt
+ clippy pedantic + markdownlint, ref .github/workflows/ci.yml:6-19).
The Python analogue here is deliberately self-contained — no external
formatter dependency — so the exact same gate runs in CI and in any
offline checkout:

Python (.py):
  * no tabs, no trailing whitespace, LF endings, final newline
  * line length <= 79 in the package and tests (PEP 8), <= 100 in
    benchmarks/examples/tools and root scripts

Markdown (.md, repo-authored docs only — driver-generated artifacts
like VERDICT/ADVICE/SURVEY are inputs, not lintable outputs):
  * no tabs, no trailing whitespace (a trailing double-space hard
    break is allowed), final newline
  * line length <= 100, except table rows, code fences and lines
    carrying URLs

Exit code 0 = clean; 1 = violations (printed one per line).
"""

from __future__ import annotations

import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]

PY_STRICT = ("petal_decomposition_tpu", "tests")
PY_RELAXED = ("benchmarks", "examples", "tools", ".")
MD_DOCS = ("README.md", "CHANGELOG.md", "docs", "BASELINE.md")

_SKIP_DIRS = {".git", "__pycache__", ".claude", "traces"}


def _files(base: pathlib.Path, suffix: str, recursive: bool = True):
    it = base.rglob(f"*{suffix}") if recursive else base.glob(f"*{suffix}")
    for p in sorted(it):
        if not set(p.relative_to(ROOT).parts[:-1]) & _SKIP_DIRS:
            yield p


def _common_checks(path: pathlib.Path, text: str, *, md: bool,
                   raw: bytes = b"") -> list[str]:
    out = []
    # CR must be checked on the BYTES: read_text()'s universal newlines
    # translate \r\n to \n before any string check could see it.
    if b"\r" in raw:
        out.append(f"{path}: CR line ending")
    if text and not text.endswith("\n"):
        out.append(f"{path}: missing final newline")
    for i, line in enumerate(text.splitlines(), 1):
        if "\t" in line:
            out.append(f"{path}:{i}: tab character")
        stripped = line.rstrip()
        if line != stripped and not (md and line == stripped + "  "):
            out.append(f"{path}:{i}: trailing whitespace")
    return out


def check_python() -> list[str]:
    out = []
    targets = [(d, 79) for d in PY_STRICT] + [(d, 100) for d in PY_RELAXED]
    for rel, limit in targets:
        base = ROOT / rel
        if not base.exists():
            continue
        recursive = rel != "."
        for p in _files(base, ".py", recursive):
            raw = p.read_bytes()
            text = raw.decode()
            rp = p.relative_to(ROOT)
            out += _common_checks(rp, text, md=False, raw=raw)
            for i, line in enumerate(text.splitlines(), 1):
                if len(line) > limit:
                    out.append(
                        f"{rp}:{i}: line too long ({len(line)} > {limit})"
                    )
    return out


def check_markdown() -> list[str]:
    out = []
    url = re.compile(r"https?://|file://")
    for rel in MD_DOCS:
        base = ROOT / rel
        if not base.exists():
            continue
        paths = _files(base, ".md") if base.is_dir() else [base]
        for p in paths:
            raw = p.read_bytes()
            text = raw.decode()
            rp = p.relative_to(ROOT)
            out += _common_checks(rp, text, md=True, raw=raw)
            fenced = False
            for i, line in enumerate(text.splitlines(), 1):
                if line.lstrip().startswith("```"):
                    fenced = not fenced
                    continue
                if fenced or "|" in line or url.search(line):
                    continue
                if len(line) > 100:
                    out.append(
                        f"{rp}:{i}: line too long ({len(line)} > 100)"
                    )
    return out


def main() -> int:
    problems = check_python() + check_markdown()
    for p in problems:
        print(p)
    if problems:
        print(f"\n{len(problems)} formatting violation(s)")
        return 1
    print("format check: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
