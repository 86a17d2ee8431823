#!/bin/bash
# Round-cadence scale gate (r13 verdict item #6): a regression in
# Dedup/Similarity must fail the replica-parity gate the SAME round it
# lands, not when someone remembers to run the tool. Builds the upscaled
# dataset if absent (ScaleUp partitioned write path), then runs
# tools/replica_parity.py against it; the script's exit status IS the
# gate. Run after `sbt compile` (classes must be current) and before the
# round bench:
#
#   tools/scale_gate.sh          # factor 10  -> sf1 gate block
#   tools/scale_gate.sh 30       # factor 30  -> replica_parity_factor30
#   tools/scale_gate.sh 100      # factor 100 -> replica_parity_factor100
#
# usage: tools/scale_gate.sh [factor] [outdir] [workdir]
set -euo pipefail
cd "$(dirname "$0")/.."
F="${1:-10}"
OUT="${2:-bigdata/sf$((F / 10))synth}"
WORK="${3:-/tmp/rp_f$F}"
SF01="${SPARK_GRAFT_SF01:-/root/testdata/sf0.1}"
# Verify wall time scales with the factor (f100's x_cosine_pairs alone is
# ~20G pair dots); give the dump phase factor-scaled headroom unless the
# caller already set a budget.
export SPARK_GRAFT_RP_VERIFY_TIMEOUT="${SPARK_GRAFT_RP_VERIFY_TIMEOUT:-$((1800 + F * 180))}"
# At factor >= 100 the exact-jaccard family's intersection exchange
# (~15k * C(F,2) * 100 rows, ~200+ GB at F=100) exceeds one box's
# scratch disk (SCALING.md "Factor-100 tier"; two confirmed disk-fill
# failures in r14) -- default the run set to the two tractable
# exact-numpy queries and stamp the rest skipped-disk-ceiling.
# Caller-overridable: a cluster (or a bigger box) can unset/override.
if [ "$F" -ge 100 ]; then
  export SPARK_GRAFT_RP_ONLY="${SPARK_GRAFT_RP_ONLY:-x_cosine_pairs,x_vec_cluster}"
  export SPARK_GRAFT_RP_SKIP_NOTE="${SPARK_GRAFT_RP_SKIP_NOTE:-skipped-disk-ceiling}"
fi
if [ ! -e "$OUT/lineitem.parquet" ]; then
  echo "== scale_gate: building $OUT at factor $F (partitioned write path) =="
  SPARK_GRAFT_SCALEUP_PARTITIONED=1 tools/run_main.sh graft.ScaleUp "$SF01" "$OUT" "$F"
fi
exec python3 tools/replica_parity.py "$SF01" "$OUT" "$WORK" "$F"
