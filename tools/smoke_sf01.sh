#!/usr/bin/env bash
# sf0.1 oracle smoke for the wide-decimal gate family (judge r9 ask #4).
#
# CORRECTNESS runs at sf0.01 — exactly where the r8-advice overflow class
# (obs·N ~ n² intermediate headroom) cannot bite. This smoke re-runs the
# ~8 gates whose arithmetic carries DECIMAL(38,0) intermediates that grow
# quadratically with row count at 10× that data, against the same DuckDB
# oracle, turning the "two-step split keeps it under 10^38" code comments
# into a checked artifact.
#
# Usage: tools/smoke_sf01.sh   (from /root/repo; exits non-zero on any
# mismatch; writes the per-gate verdicts to /tmp/smoke_sf01/)
set -euo pipefail
cd "$(dirname "$0")/.."
GATES=q_chi2_select,q_embedding_drift,q_mann_whitney,q_kruskal_wallis,q_gini,q_modularity,q_assortativity,q_benford_gof
OUT=/tmp/smoke_sf01
SPARK_GRAFT_VERIFY_ONLY="$GATES" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $OUT"
python3 tools/check.py /root/testdata/sf0.1 "$OUT"
