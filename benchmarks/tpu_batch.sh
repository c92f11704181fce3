#!/bin/bash
# Round-3 TPU measurement batch. Run inside tmux (tunnel compiles can take
# tens of minutes when the remote-compile queue is backed up; each stage
# retries once). Results land in /tmp/tpu_batch/.
set -u
OUT=/tmp/tpu_batch
mkdir -p $OUT
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

stage() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S)" | tee -a $OUT/log
  "$@" >$OUT/$name.out 2>&1
  rc=$?
  echo "=== $name done rc=$rc $(date +%H:%M:%S)" | tee -a $OUT/log
}

stage tpu_tests python -m pytest tpu_tests/ -q -m tpu -p no:cacheprovider
stage profile_full python benchmarks/profile_resample_split.py full
stage profile_AB python benchmarks/profile_resample_split.py A B
stage profile_CD python benchmarks/profile_resample_split.py C D
stage bench python bench.py
stage ukf_full python benchmarks/profile_ukf.py full
stage ukf_parts python benchmarks/profile_ukf.py chol solve prop
stage dpf_linear python benchmarks/run_benchmarks.py dpf_linear
stage scaling python benchmarks/scaling_curve.py
echo "ALL DONE $(date +%H:%M:%S)" | tee -a $OUT/log
