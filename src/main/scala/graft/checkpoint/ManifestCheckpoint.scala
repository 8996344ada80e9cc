package graft.checkpoint

import graft.io.ClipsGenerator
import graft.validate.RowValidator
import graft.spec.TableSpec
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition checkpoint manifest (north rule: "Validation state
  * checkpoints per Iceberg partition to a manifest table so interrupted runs
  * resume with exact per-partition lineage and metrics").
  *
  * Design: an append-only parquet manifest keyed by partition value; each
  * completed partition writes one entry carrying
  *  - lineage: a content fingerprint (row count + order-independent
  *    xxhash64-XOR of the key column) of the exact input slice validated,
  *  - metrics: total/error/valid row counts,
  *  - completion wall-clock.
  * On resume, partitions whose manifest entry matches the CURRENT content
  * fingerprint are skipped; changed or absent partitions re-run. Latest
  * entry per partition wins (re-validation after data change appends).
  *
  * This is the batch analog of a streaming checkpoint — no Structured
  * Streaming state store needed because validation is idempotent per
  * partition (SURVEY.md §2.6 "resume-from-checkpoint is batch-manifest-
  * based"). In real Iceberg the fingerprint would be the partition's
  * snapshot/data-file set; with emulated parquet partitions we fingerprint
  * content directly.
  */
object ManifestCheckpoint {

  final case class ManifestEntry(
      partition_value: String,
      content_rows: Long,
      content_hash: Long,
      total_rows: Long,
      error_rows: Long,
      valid_rows: Long,
      completed_at_ms: Long,
  )

  /** Order-independent content fingerprint per partition: (rows, xor of
    * key hashes) — one column-pruned aggregation. */
  def fingerprints(df: DataFrame, partitionCol: String, keyCol: String): DataFrame =
    df.groupBy(col(partitionCol).cast("string").as("partition_value"))
      .agg(count(lit(1)).as("content_rows"),
        // BIT_XOR aggregate of per-key hashes: associative+commutative, so
        // partition layout / task order can't change the fingerprint
        expr(s"bit_xor(xxhash64($keyCol))").as("content_hash"))

  def readManifest(spark: SparkSession, manifestDir: String): Option[DataFrame] =
    try {
      val df = spark.read.parquet(manifestDir)
      if (df.columns.contains("partition_value")) Some(df) else None
    } catch { case _: Exception => None }

  /** Latest manifest entry per partition (by completed_at_ms). */
  def latestEntries(manifest: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("partition_value"))
      .orderBy(col("completed_at_ms").desc)
    manifest.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  /** Partition values that still need validation: no manifest entry, or
    * content fingerprint changed since the recorded run. */
  def pendingPartitions(spark: SparkSession, df: DataFrame,
      partitionCol: String, keyCol: String, manifestDir: String): Seq[String] = {
    val current = fingerprints(df, partitionCol, keyCol)
    readManifest(spark, manifestDir) match {
      case None => current.select("partition_value").collect().map(_.getString(0)).toSeq
      case Some(m) =>
        val done = latestEntries(m)
          .select(col("partition_value"), col("content_rows").as("m_rows"),
            col("content_hash").as("m_hash"))
        current.join(done, Seq("partition_value"), "left_outer")
          .where(col("m_rows").isNull ||
            col("m_rows") =!= col("content_rows") ||
            col("m_hash") =!= col("content_hash"))
          .select("partition_value").collect().map(_.getString(0)).toSeq
    }
  }

  /** Validate only pending partitions; write violations under
    * `outDir/violations/partition_value=<v>/` and append manifest entries.
    * Returns the partitions processed this run. Idempotent: re-running
    * after completion is a no-op; re-running after a kill resumes where it
    * stopped.
    *
    * Batched (round-1 verdict #5): ONE slice covers every pending
    * partition, ONE dynamic-partitioned write emits all violations, and
    * ONE grouped aggregation computes every partition's summary AND content
    * fingerprint together — a constant number of jobs regardless of
    * partition count (the per-partition loop ran ~2 jobs × N partitions,
    * serially: ~2000 jobs at 1000 partitions). */
  def runResumable(spark: SparkSession, df: DataFrame, spec: TableSpec,
      manifestDir: String, outDir: String): Seq[String] = {
    import spark.implicits._
    require(spec.partitionCols.size == 1 && spec.keyCols.size == 1,
      "resumable runs checkpoint on a single partition column + single key")
    val partCol = spec.partitionCols.head
    val keyCol = spec.keyCols.head
    val pending = pendingPartitions(spark, df, partCol, keyCol, manifestDir)
    if (pending.isEmpty) return pending
    // filter on the STRINGIFIED partition value — the exact keying the
    // fingerprint uses, so non-string partition columns (date, decimal)
    // can't silently mismatch the manifest entries they produced
    val slice = df.where(col(partCol).cast("string").isin(pending: _*))
    val run = RowValidator.validate(slice, spec)
    run.violations
      .withColumn("partition_value", col(partCol).cast("string"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic") // only pending dirs replaced
      .partitionBy("partition_value")
      .parquet(s"$outDir/violations")
    val failed = filter(col(RowValidator.ViolationsCol), _.isNotNull)
    val now = System.currentTimeMillis()
    val entries = run.annotated
      .groupBy(col(partCol).cast("string").as("partition_value"))
      .agg(
        count(lit(1)).as("total_rows"),
        coalesce(sum(when(size(failed) > 0, 1L).otherwise(0L)), lit(0L))
          .as("error_rows"),
        expr(s"bit_xor(xxhash64($keyCol))").as("content_hash"))
      .collect() // O(#pending partitions) rows — driver-safe by construction
      .map { r =>
        val total = r.getAs[Long]("total_rows")
        val errors = r.getAs[Long]("error_rows")
        ManifestEntry(r.getAs[String]("partition_value"),
          total, r.getAs[Long]("content_hash"),
          total, errors, total - errors, now)
      }
    entries.toSeq.toDF().write.mode(SaveMode.Append).parquet(manifestDir)
    pending
  }
}
