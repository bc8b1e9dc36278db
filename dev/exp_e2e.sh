#!/bin/bash
# Post-kernel-sweep TPU e2e validation (session experiment).
# Chained behind exp_strip.py: waits for it to exit, then runs the
# 100k block e2e and the 100k ring e2e with verbose stage timers.
while pgrep -f "python /root/repo/dev/exp_strip.py" > /dev/null; do
  sleep 60
done
cd /root/repo
FIX=/tmp/ngsld_bench_fix_100k
echo "=== block e2e (100k x 100 kb100, strip default) ==="
timeout 2400 python -m ngsld_tpu.cli \
  --geno $FIX/sim.glf --log_scale --n_ind 100 --n_sites 100000 \
  --pos $FIX/sim.pos --max_kb_dist 100 --extend_out --engine jax \
  --verbose 2 --out /tmp/e2e_block.ld 2>&1 | tail -40
echo "=== ring e2e (same config, 1-device ring) ==="
timeout 2400 python -m ngsld_tpu.cli \
  --geno $FIX/sim.glf --log_scale --n_ind 100 --n_sites 100000 \
  --pos $FIX/sim.pos --max_kb_dist 100 --extend_out --engine jax \
  --ring --verbose 2 --out /tmp/e2e_ring.ld 2>&1 | tail -40
echo "=== md5 compare (block vs ring rows) ==="
wc -l /tmp/e2e_block.ld /tmp/e2e_ring.ld
cmp -s /tmp/e2e_block.ld /tmp/e2e_ring.ld && echo BYTE_EQUAL || echo DIFFER
echo "ALL_DONE"
