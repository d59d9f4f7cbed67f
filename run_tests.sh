#!/bin/bash
# Test runner: batches the suite into separate processes because XLA:CPU's
# compiler can segfault after compiling many large prover graphs in one
# process (flaky, jax 0.9.0; see NOTES_ROUND1.md #3).
set -e
PY=${PY:-/opt/venv/bin/python}
$PY -m pytest tests/test_field.py tests/test_transcript.py \
    tests/test_curve_pairing.py tests/test_poseidon.py tests/test_merkle.py \
    tests/test_gates_ext.py tests/test_ipa.py -q "$@"
$PY -m pytest tests/test_mont_jax.py tests/test_ops_jax.py \
    tests/test_msm_jax.py -q "$@"
$PY -m pytest tests/test_e2e_ref.py tests/test_serde.py -q "$@"
$PY -m pytest tests/test_merkle_layout.py tests/test_keys_io.py -q "$@"
$PY -m pytest tests/test_fuzz_differential.py -q "$@"
$PY -m pytest tests/test_prover_tpu.py -q "$@"
$PY -m pytest tests/test_parallel.py -q "$@"
echo "ALL BATCHES PASSED"
