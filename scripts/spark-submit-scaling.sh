#!/usr/bin/env bash
# North-rule cluster launch: the same validation-suite job at N and 4N
# executors over the SAME input table, reporting throughput at both levels;
# scaling efficiency = (wall_N / wall_4N) / 4 from the two JSON lines.
#
# graft.Bench cooperates with spark-submit: when the `spark.master` system
# property is set (always, under spark-submit) it does NOT override the
# master / shuffle partitioning / local dirs, and with the env below it
# benchmarks the supplied table instead of generating one:
#   SPARK_GRAFT_INPUT_DIR  dir containing clips/ and catalog/ (parquet)
#   SPARK_GRAFT_QUERIES=0  skip the per-query correctness-suite phase
#   SPARK_GRAFT_SCALING=0  one level per submit (the two submits ARE the
#                          two levels — in-JVM interleaving is a local-mode
#                          technique)
#   SPARK_GRAFT_DENSE=0    skip the generated-input dense phase
#
# The sandbox analog (no cluster manager available) is graft.Bench's two
# local parallelism levels on identical input — see BASELINE.md for why the
# undersubscribed pair is the honest in-container predictor.
#
# Usage:
#   scripts/spark-submit-scaling.sh <jar> <input-dir> [N] [executor-cores] [executor-mem]
# Example:
#   scripts/spark-submit-scaling.sh target/scala-2.13/fastdataframespark_2.13-0.1.jar \
#     s3://bucket/clips-table 16 4 8g
set -euo pipefail

JAR=${1:?jar path}
INPUT=${2:?input dir (must contain clips/ and catalog/ parquet)}
N=${3:-16}
CORES=${4:-4}
MEM=${5:-8g}
N4=$((N * 4))

run_level() {
  local execs=$1
  SPARK_GRAFT_INPUT_DIR="$INPUT" \
  SPARK_GRAFT_QUERIES=0 SPARK_GRAFT_SCALING=0 SPARK_GRAFT_DENSE=0 \
  SPARK_GRAFT_BENCH_OUT="bench_${execs}execs.json" \
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
echo "Efficiency = (scan_wall_sec[N] / scan_wall_sec[4N]) / 4 from" \
     "bench_${N}execs.json and bench_${N4}execs.json."
