#!/usr/bin/env bash
# Build and upload the package (reference misc/deploy.sh role).
set -euo pipefail
cd "$(dirname "$0")/.."
rm -rf build dist *.egg-info
python setup.py sdist bdist_wheel
twine upload dist/*
