#!/bin/bash
# Install entry point (mirrors the reference's install.sh,
# /root/reference/install.sh:26-33).  No Cython/RVO2 build step exists
# here: ORCA is implemented natively in JAX (gym_collision_avoidance_tpu/
# ops/orca.py) and the C++ oracle (native/orca.cpp) is only compiled on
# demand by the test suite.  Pass MAKE_VENV=false to install into the
# current interpreter (the default on managed images where jax is baked
# in).
set -e

MAKE_VENV=${1:-false}
DIR="$( cd "$( dirname "${BASH_SOURCE[0]}" )" && pwd )"

if $MAKE_VENV; then
    cd "$DIR"
    python3 -m venv venv
    source venv/bin/activate
fi

python -m pip install -e "$DIR"

echo "Finished installing gym_collision_avoidance_tpu!"
