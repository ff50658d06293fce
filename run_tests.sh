#!/bin/bash
# Test runner (the reference's RecBole/run_test.sh analog).
# Runs on a virtual 8-device CPU mesh (tests/conftest.py forces it).
#
# One command, one sitting: the suite is parallelized with pytest-xdist
# (each worker gets its own process + virtual mesh). A cold serial run
# exceeds 10 minutes; `-n 4` finishes well inside it. Pass -n0 (or any
# pytest args) to override.
set -e
cd "$(dirname "$0")"
NPROC=${OOVREC_TEST_WORKERS:-4}
python -m pytest tests/ -q -n "$NPROC" "$@"
