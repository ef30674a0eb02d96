#!/usr/bin/env bash
# CI-style installability gate (round-4 VERDICT item 7).
#
# The round-4 suite shipped red because the multi-process worker could only
# import xtagclip_tpu with an externally-set PYTHONPATH — i.e. the suite
# had never been run the way a user would run it. This script is that run:
# editable-install the package, then drive the import, the package-data
# asset resolution, and the FULL test suite from a cwd OUTSIDE the repo,
# with no PYTHONPATH. Reference analogue: the upstream repo is a plain
# pip-installable setup.py package (/root/reference/setup.py).
#
# Usage: tools/ci_check.sh [extra pytest args]
# (CPU-forced: the one real TPU chip on this box is reserved for bench.)
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"

unset PYTHONPATH || true
export JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu

pip install -e "$REPO" -q --no-deps --no-build-isolation

WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT
cd "$WORK"

python - <<'EOF'
import os
import xtagclip_tpu
from xtagclip_tpu.factory import list_models

assert not os.getcwd().startswith(os.path.dirname(
    os.path.dirname(xtagclip_tpu.__file__))), "must run outside the repo"
n = len(list_models())
assert n >= 117, f"only {n} model configs resolved — package data broken"
print(f"installed at {os.path.dirname(xtagclip_tpu.__file__)}; "
      f"{n} model configs resolve from package data")
EOF

exec python -m pytest "$REPO/tests" -q "$@"
