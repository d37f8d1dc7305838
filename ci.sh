#!/usr/bin/env bash
# Local CI: the one command that reproduces .github/workflows/ci.yml.
# Mirrors the reference's tox tiers (/root/reference/tox.ini:11-75):
# tests on the CPU backend with 8 virtual devices, lint/type gates (when the
# tools are installed), a wheel build, and an installed-CLI --help smoke.
set -euo pipefail
cd "$(dirname "$0")"

echo "== pytest (CPU backend, 8 virtual devices) =="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m pytest tests/ -q

echo "== ruff =="
if python -m ruff --version >/dev/null 2>&1; then
    python -m ruff check basic_pitch_tpu tests tools
else
    echo "ruff not installed (pip install -e .[lint]); skipping"
fi

echo "== mypy =="
if python -m mypy --version >/dev/null 2>&1; then
    python -m mypy basic_pitch_tpu
else
    echo "mypy not installed (pip install -e .[lint]); skipping"
fi

echo "== public-API annotation gate (strict-typing ratchet) =="
python tools/check_annotations.py

echo "== README perf table freshness =="
python tools/update_readme_perf.py
git diff --quiet -- README.md || {
    echo "README.md perf table is stale — commit the regenerated table"; exit 1; }

echo "== byte-compile gate (syntax across the tree) =="
python -m compileall -q basic_pitch_tpu tests tools bench.py __graft_entry__.py

echo "== wheel build =="
rm -rf build dist
if python -c "import build" >/dev/null 2>&1; then
    # --no-isolation keeps the build offline-capable (CI uses isolation)
    python -m build --wheel --no-isolation >/dev/null
else
    python -m pip wheel . --no-deps --no-build-isolation -w dist >/dev/null
fi
ls dist/*.whl

echo "== wheel manifest (check-manifest analogue, tox.ini:58-64) =="
python tools/check_wheel_manifest.py dist/*.whl

echo "== installed-CLI smoke =="
# install the wheel into an isolated prefix (deps come from the running
# environment, so this works offline) and run the console scripts from it
SMOKE_DIR="$(mktemp -d)"
python -m pip install --no-deps -q --target "$SMOKE_DIR" dist/*.whl
PYTHONPATH="$SMOKE_DIR" python "$SMOKE_DIR/bin/basic-pitch" --help >/dev/null
PYTHONPATH="$SMOKE_DIR" python "$SMOKE_DIR/bin/basic-pitch-train" --help >/dev/null
PYTHONPATH="$SMOKE_DIR" python "$SMOKE_DIR/bin/bp-download" guitarset --help >/dev/null
PYTHONPATH="$SMOKE_DIR" python "$SMOKE_DIR/bin/basic-pitch-eval" --help >/dev/null
PYTHONPATH="$SMOKE_DIR" python "$SMOKE_DIR/bin/basic-pitch-serve" --help >/dev/null
PYTHONPATH="$SMOKE_DIR" python "$SMOKE_DIR/bin/basic-pitch-stream" --help >/dev/null
rm -rf "$SMOKE_DIR"
echo "CI green ✨"
