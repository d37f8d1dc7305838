"""check-manifest equivalent: the built wheel must contain every tracked
package file (reference gates this via its check-manifest tox tier,
/root/reference/tox.ini:58-64 — a missing asset or data file ships a broken
package that unit tests never catch).

Usage: python tools/check_wheel_manifest.py dist/*.whl
Exits non-zero listing any git-tracked file under basic_pitch_tpu/ that the
wheel does not carry.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys
import zipfile

# tracked files the wheel legitimately omits: C++ sources ship compiled or
# are built on first use by native/__init__.py from the installed copy —
# so they MUST be in the wheel too; nothing is exempt today.
EXEMPT: frozenset = frozenset()


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print("usage: check_wheel_manifest.py <wheel>", file=sys.stderr)
        return 2
    wheel = pathlib.Path(argv[0])
    repo = pathlib.Path(__file__).resolve().parent.parent

    tracked = subprocess.run(
        ["git", "-C", str(repo), "ls-files", "basic_pitch_tpu"],
        capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    with zipfile.ZipFile(wheel) as zf:
        shipped = set(zf.namelist())

    missing = [
        path for path in tracked
        if path not in shipped and path not in EXEMPT
    ]
    if missing:
        print(f"{wheel.name}: {len(missing)} tracked package files missing:")
        for path in missing:
            print(f"  {path}")
        return 1
    print(f"{wheel.name}: all {len(tracked)} tracked package files shipped")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
