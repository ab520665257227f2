#!/bin/bash
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp
mkdir -p $JAX_COMPILATION_CACHE_DIR
for c in basic voxel batch mask contract inf noise relu_field combo mixed scaffold; do
  echo "=== $c $(date +%H:%M:%S) ==="
  timeout 1800 python -u scratch/test_pallas_tpu.py $c 2>&1 | grep -vi warn
done
echo "ALL DONE $(date +%H:%M:%S)"
