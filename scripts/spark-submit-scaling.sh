#!/usr/bin/env bash
# North-rule cluster launch: the same validation job at N and 4N executors,
# reporting throughput at both plus scaling efficiency.
#
# On a real cluster this is the authoritative scaling measurement; the
# sandbox analog (no cluster manager available) is graft.Bench's two
# parallelism levels on identical input — see BASELINE.md for why the
# undersubscribed pair is the honest in-container predictor.
#
# Usage:
#   scripts/spark-submit-scaling.sh <jar> <input-dir> [N] [executor-cores] [executor-mem]
# Example:
#   scripts/spark-submit-scaling.sh target/scala-2.13/fastdataframespark_2.13-0.1.jar \
#     s3://bucket/clips-table 16 4 8g
set -euo pipefail

JAR=${1:?jar path}
INPUT=${2:?input dir (clips parquet/Iceberg root)}
N=${3:-16}
CORES=${4:-4}
MEM=${5:-8g}
N4=$((N * 4))

run_level() {
  local execs=$1
  # SPARK_GRAFT_* env is read by graft.Bench; QUERIES=0 + SCAN-only keeps
  # this a pure suite-throughput measurement on the shared input
  SPARK_GRAFT_SF_DIR="$INPUT" SPARK_GRAFT_QUERIES=0 SPARK_GRAFT_SCALING=0 \
  spark-submit \
    --class graft.Bench \
    --deploy-mode client \
    --num-executors "$execs" \
    --executor-cores "$CORES" \
    --executor-memory "$MEM" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.adaptive.skewJoin.enabled=true \
    --conf spark.sql.shuffle.partitions=$((execs * CORES * 2)) \
    --conf spark.dynamicAllocation.enabled=false \
    "$JAR"
}

echo "=== level 1: $N executors x $CORES cores ==="
run_level "$N"
echo "=== level 2: $N4 executors x $CORES cores ==="
run_level "$N4"
echo "Compute efficiency = (wall_N / wall_4N) / 4 from the two JSON lines."
