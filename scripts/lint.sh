#!/usr/bin/env bash
# Lint gate (the reference's dev-support/lint.sh equivalent, reimplemented
# dependency-free: isort/black are not installable in this environment —
# scripts/lint_check.py documents the enforced subset).
set -euo pipefail
cd "$(dirname "$0")/.."

python -m compileall -q speechclip_tpu tests scripts \
    bench.py __graft_entry__.py run_task.py example.py
python scripts/lint_check.py
