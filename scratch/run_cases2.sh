#!/bin/bash
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp
mkdir -p $JAX_COMPILATION_CACHE_DIR
LOG=/tmp/parity_cases.log
: > $LOG
for c in basic voxel batch mask contract inf noise relu_field combo mixed scaffold; do
  echo "=== $c $(date +%H:%M:%S) ===" >> $LOG
  timeout 1200 python -u scratch/test_pallas_tpu.py $c 2>&1 | grep -vi warn | tail -4 >> $LOG
done
echo "ALL DONE $(date +%H:%M:%S)" >> $LOG
