#!/bin/bash
# Minimum working example (mirrors the reference's example.sh entry point,
# /root/reference/example.sh — here it drives the TPU-native engine).
set -e
DIR="$( cd "$( dirname "${BASH_SOURCE[0]}" )" && pwd )"
cd "$DIR"
python scripts/example.py "$@"
