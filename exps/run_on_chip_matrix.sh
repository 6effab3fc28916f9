#!/bin/bash
# On-chip verification + bench matrix for the round-2 continuation features.
# Launched automatically by the TPU probe when the relay recovers, or by
# hand. Everything logs to /tmp/chip_matrix/; each step has its own timeout
# so one hang doesn't eat the session. Compile cache persists across steps.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/root/jax_cache
OUT=/tmp/chip_matrix
mkdir -p $OUT

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" >> $OUT/summary.log
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name exit $? $(date +%H:%M:%S)" >> $OUT/summary.log
}

# 1. correctness: int8 KV + rope fuse + paged int8 on the real chip
run verify_kv_int8 1800 python -u exps/verify_kv_int8_tpu.py

# 2. headline bench (unchanged config — guards the 4754 tok/s number)
run bench_headline 2400 python -u bench.py

# 3. rope-fuse A/B on the headline config
ACCESSORY_ROPE_FUSE=1 run bench_ropefuse 1800 python -u bench.py

# 4. int8 KV decode
BENCH_KV_DTYPE=int8 run bench_kv8 1800 python -u bench.py

# 5. 4k ctx (bf16 KV)
run bench_longctx 2400 python -u bench_all.py --only longctx

# 6. int8 KV at 4k ctx (the KV-dominated regime where int8 pays +45%)
run bench_kv8_longctx 1800 python -u bench_all.py --only kv8-longctx

# 7. prefill TTFT with the dense-m dequant path A/B
run bench_ttft 1800 python -u bench_all.py --only ttft
ACCESSORY_QMM_DENSE_M=512 run bench_ttft_dense 1800 python -u bench_all.py --only ttft

# 8. scheduler serving variants (default = Pallas paged kernel)
run bench_sched 2400 python -u bench_all.py --only sched
run bench_sched_pc 2400 python -u bench_all.py --only sched-pc
run bench_sched_spec 2400 python -u bench_all.py --only sched-spec

# 9. paged-kernel A/B: same scheduler bench on the XLA gather path
ACCESSORY_PAGED_KERNEL=0 run bench_sched_gather 2400 python -u bench_all.py --only sched

# 10. long-prompt serving (2k prompts, 4k pool) — kernel vs gather
run bench_sched_long 2400 python -u bench_all.py --only sched-long
ACCESSORY_PAGED_KERNEL=0 run bench_sched_long_gather 2400 python -u bench_all.py --only sched-long

# 10b. 16-bit scale storage A/B on the headline config (halves the
# scales+zeros share of the weight stream). bfloat16: Mosaic rejects f16
# blocks outright ("Unsupported type f16"), and r4 removed the host-side
# f32 astype that used to mask that — f16 now fails loudly at lowering.
ACCESSORY_SCALES_DTYPE=bfloat16 run bench_scales_bf16 1800 python -u bench.py

# 11. training-step throughput/MFU (reference headline: finetune GPU-hours)
run bench_train 2400 python -u bench_all.py --only train
run bench_train_qpeft 2400 python -u bench_all.py --only train-qpeft

# 11b. model-zoo decode rows (7B dense + int8-KV, MoE, SPHINX prefill)
run bench_7b 2400 python -u bench_all.py --only 7b
run bench_7b_kv8 1800 python -u bench_all.py --only 7b-kv8
run bench_moe 2400 python -u bench_all.py --only moe
run bench_sphinx 1800 python -u bench_all.py --only sphinx

# 11c. device-bound serving aggregate: deep saturation with the multi-step
# decode knob swept 8/16/32, each traced so tokens/device-busy-s (what a
# co-located host sees) prints next to the wall number (VERDICT r4 #5)
run bench_sched_nsteps 3600 python -u bench_all.py --only sched-nsteps

# 12. 70B decode projection from real measured 70B-shaped layers
run bench_70b 2400 python -u bench_all.py --only 70b

# 13. Large-DiT training step (the DiT sub-project headline is train speed)
run bench_dit 2400 python -u bench_all.py --only dit

# 14. quantization-accuracy protocol: fixture ppl FP vs W4 vs W3 through
# the Pallas kernels (the OmniQuant ppl-delta role at fixture scale;
# real weights = exps/verify_real_weights.sh, same code path)
run bench_ppl_delta 3600 python -u exps/bench_ppl_quant_delta.py

# 15. LLaMA2-7B per-kernel step budget (int8 default arm): regression
# tripwire for the r5 levers — planes ~50/84/15 µs-class clusters,
# grouped attention ~114 µs/layer, head 349, busy ~10.5 ms (757+ tok/s)
run trace_7b_budget 2400 python -u exps/trace_7b_budget.py int8 10

echo "MATRIX DONE $(date)" >> $OUT/summary.log
touch /tmp/chip_matrix_done.flag
