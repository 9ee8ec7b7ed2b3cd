#!/bin/bash
# TPU measurement sequence once the axon tunnel is reachable.
# Run:  bash tools/tpu_roundout.sh 2>&1 | tee /tmp/roundout.log
# Each step is independently time-bounded; a wedged step must not take
# the rest down.  Order matters: classic first (known-good lowering)
# so a persistent-kernel compile problem is unambiguous.
set -x
cd "$(dirname "$0")/.."

echo "== tunnel probe =="
timeout 60 python -c "import jax,time; t0=time.time(); jax.devices(); print('tunnel ok %.1fs'%(time.time()-t0))" || exit 1

echo "== classic wave micro (known-good lowering) =="
timeout 600 python tools/wave_ab.py 64 6000 classic

echo "== persistent wave micro (first Mosaic compile of the big kernel) =="
timeout 900 python tools/wave_ab.py 64 6000 persistent

echo "== tunnel still alive? =="
timeout 60 python -c "import jax; jax.devices(); print('alive')" || exit 1

echo "== packed-operand A/B (classic driver) =="
DAMAPPER_WAVE_PACKOPS=1 timeout 600 python tools/wave_ab.py 64 6000 classic

echo "== packed-operand persistent micro =="
DAMAPPER_WAVE_PACKOPS=1 timeout 900 python tools/wave_ab.py 64 6000 persistent

echo "== lane-packed classic micro (two lanes per vreg row) =="
timeout 900 python tools/wave_ab.py 64 6000 lanepack

echo "== lane-packed persistent micro =="
timeout 900 python tools/wave_ab.py 64 6000 plp

echo "== A/B at batch scale =="
timeout 900 python tools/wave_ab.py 256 6000

echo "== pick the measured-fastest wave mode as the default =="
python tools/pick_wave_mode.py || true
cat damapper_tpu/wave_mode.json 2>/dev/null || true

echo "== 12Mb bench: classic vs persistent (both legs pinned: the mode"
echo "   file written above must not silently flip the classic leg) =="
DAMAPPER_WAVE_PERSISTENT=0 BENCH_GLEN=12000000 BENCH_NREADS=200 \
  BENCH_VARIANTS=0 BENCH_REPEATS=1 timeout 560 python bench.py
DAMAPPER_WAVE_PERSISTENT=1 BENCH_GLEN=12000000 BENCH_NREADS=200 \
  BENCH_VARIANTS=0 BENCH_REPEATS=1 timeout 560 python bench.py

echo "== default-config bench (the driver's round-end config; unpinned"
echo "   on purpose — this is what the picked wave_mode.json delivers) =="
timeout 1800 python bench.py
DAMAPPER_WAVE_PERSISTENT=1 timeout 1800 python bench.py
