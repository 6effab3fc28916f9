#!/bin/bash
# Real-weights validation ladder — one command, the day checkpoints appear.
#   exps/verify_real_weights.sh /path/to/TinyLlama-1.1B [wikitext2.txt]
# Runs import -> golden logits vs transformers -> FP-vs-W4 ppl -> decode.
# Expected outputs are documented in exps/verify_real_weights.py.
set -eu
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/jax_cache}
CKPT=${1:?usage: verify_real_weights.sh CKPT_DIR [TEXT_FILE]}
TEXT=${2:-}
ARGS=()
[ -n "$TEXT" ] && ARGS+=(--text "$TEXT")
exec python -u exps/verify_real_weights.py "$CKPT" "${ARGS[@]}"
