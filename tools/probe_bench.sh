#!/bin/sh
# Builder-side bench probe wrapper: marks the capture as a PROBE so the
# override-streak history (bench/override_history.json) — whose semantics
# are defined over consecutive OFFICIAL captures — is read but never
# advanced. Usage mirrors the official invocation:
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/probe_bench.sh [sbt args]
# Defaults to running the Bench main via sbt.
set -e
export SPARK_GRAFT_BENCH_PROBE=1
if [ $# -eq 0 ]; then
  exec sbt --error "runMain graft.Bench"
else
  exec "$@"
fi
