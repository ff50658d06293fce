#!/bin/bash
# Test runner (the reference's RecBole/run_test.sh analog).
# Runs on a virtual 8-device CPU mesh (tests/conftest.py forces it).
set -e
cd "$(dirname "$0")"
python -m pytest tests/ -q "$@"
