#!/usr/bin/env python
"""Type-annotation ratchet gate for the package's public API.

The reference gates on `mypy --strict` (reference `tox.ini:49-56`); this
image has no mypy (and no package installs), so CI enforces the part of
strict typing that is checkable without a type checker: every PUBLIC
function in `basic_pitch_tpu` must annotate all parameters and its return
type. Files that predate the gate are grandfathered with their current
miss-count; the gate FAILS if any file regresses (count grows or a new
file appears with misses) and prompts a ratchet-down when a file improves,
so the debt only shrinks. `ci.sh` runs this after the lint tier.

Usage:  python tools/check_annotations.py [--update]
  --update rewrites the GRANDFATHERED table in-place to current counts
  (use after annotating a file; the diff shows the ratchet moving down).
"""

from __future__ import annotations

import ast
import pathlib
import re
import sys

PACKAGE = pathlib.Path(__file__).resolve().parent.parent / "basic_pitch_tpu"

# file (relative to the package) -> number of public functions still
# missing full signature annotations. Regressions fail CI; improvements
# prompt a ratchet-down. Keep sorted by count.
GRANDFATHERED = {
}


def _public_functions(tree: ast.Module) -> list[ast.FunctionDef]:
    """Module-level functions and methods of module-level classes —
    closures nested inside functions are implementation detail, not API."""
    out: list = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            out.append(node)
        elif isinstance(node, ast.ClassDef):
            out.extend(
                n for n in node.body
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            )
    return out


def misses_in(path: pathlib.Path) -> list[str]:
    """Names of public functions in ``path`` missing any annotation."""
    tree = ast.parse(path.read_text())
    out = []
    for node in _public_functions(tree):
        if node.name.startswith("_"):
            continue
        a = node.args
        params = a.posonlyargs + a.args + a.kwonlyargs
        unannotated = [
            p.arg
            for p in params
            if p.annotation is None and p.arg not in ("self", "cls")
        ]
        if a.vararg is not None and a.vararg.annotation is None:
            unannotated.append("*" + a.vararg.arg)
        if a.kwarg is not None and a.kwarg.annotation is None:
            unannotated.append("**" + a.kwarg.arg)
        if unannotated or node.returns is None:
            what = ",".join(unannotated) or "<return>"
            out.append(f"{node.name}:{node.lineno} ({what})")
    return out


def main(argv: list[str]) -> int:
    update = "--update" in argv
    current: dict[str, list[str]] = {}
    for path in sorted(PACKAGE.rglob("*.py")):
        rel = str(path.relative_to(PACKAGE))
        misses = misses_in(path)
        if misses:
            current[rel] = misses

    failed = False
    can_ratchet = []
    for rel, misses in sorted(current.items()):
        allowed = GRANDFATHERED.get(rel, 0)
        if len(misses) > allowed:
            failed = True
            print(f"REGRESSION {rel}: {len(misses)} unannotated public "
                  f"functions (grandfathered {allowed})")
            for m in misses:
                print(f"    {m}")
        elif len(misses) < allowed:
            can_ratchet.append((rel, allowed, len(misses)))
    for rel in sorted(set(GRANDFATHERED) - set(current)):
        can_ratchet.append((rel, GRANDFATHERED[rel], 0))

    if update:
        table = "".join(
            f'    "{rel}": {len(m)},\n' for rel, m in sorted(
                current.items(), key=lambda kv: (-len(kv[1]), kv[0]))
        )
        src_path = pathlib.Path(__file__)
        src = src_path.read_text()
        src = re.sub(r"GRANDFATHERED = \{\n.*?\n\}\n",
                     "GRANDFATHERED = {\n" + table + "}\n", src,
                     count=1, flags=re.S)
        src_path.write_text(src)
        print(f"ratchet table rewritten: {len(current)} files, "
              f"{sum(len(m) for m in current.values())} misses")
        return 0

    if can_ratchet and not failed:
        print("ratchet can tighten (run with --update):")
        for rel, old, new in can_ratchet:
            print(f"    {rel}: {old} -> {new}")
    total = sum(len(m) for m in current.values())
    print(f"annotation gate: {total} grandfathered misses across "
          f"{len(current)} files; {'FAIL' if failed else 'ok'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
