#!/bin/bash
# Dev check lane (reference analog: ruff+mypy dev-deps,
# /root/reference/pyproject.toml:63-73, and the lint CI at
# .github/workflows/ci.yaml). Runs the linter (real ruff when
# installed, else the stdlib fallback scripts/lint_lite.py) and the
# <60s smoke test lane.
set -e
cd "$(dirname "$0")/.."
if command -v ruff > /dev/null 2>&1; then
  ruff check yolox_tpu tests scripts bench.py __graft_entry__.py
else
  python scripts/lint_lite.py
fi
JAX_PLATFORMS=cpu python -m pytest tests -m smoke -q
