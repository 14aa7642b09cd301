#!/usr/bin/env bash
# Pre-commit gate -- the analog of the reference's tests/pre-commit-script.sh
# (clang-format + clang-tidy + plain/ASAN/UBSAN builds each running the test
# binary).  Here: byte-compile lint, the native build, the fast oracle/unit
# tests, and the exhaustive limb-arithmetic property tests (our UBSAN analog
# for the hand-rolled u64-in-u32 math).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== lint (byte-compile all sources) =="
python -m compileall -q ntt_tpu tests tools bench.py __graft_entry__.py

echo "== native core build =="
make -C csrc >/dev/null

echo "== fast tests (oracle, twiddles, limb-arithmetic properties) =="
python -m pytest tests/test_modmath.py tests/test_twiddles.py \
    tests/test_refmodel.py tests/test_polymul.py tests/test_native.py -q

echo "== kernel + API + dist tests =="
python -m pytest tests/test_kernels_jnp.py tests/test_variants_new.py \
    tests/test_dist.py tests/test_cli.py -q

echo "pre-commit gate: OK"
