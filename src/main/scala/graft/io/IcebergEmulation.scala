package graft.io

import graft.spec.{AliasType, TableSpec}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

/** Iceberg-shaped table I/O.
  *
  * This sandbox ships no Iceberg jars (`ls /opt/spark/jars | grep iceberg`
  * is empty — SURVEY.md §7.4 risk 1), so the storage layout is emulated
  * with Hive-style partitioned parquet plus [[graft.checkpoint.ManifestCheckpoint]]
  * for per-partition lineage. [[createTableDdl]] emits the real
  * `CREATE TABLE ... USING iceberg` statement so a cluster with an Iceberg
  * catalog is a drop-in: same schema derivation (the reference's
  * `iceberg_schema`, `/root/reference/src/fastdataframe/iceberg/model.py:190-204`),
  * with field IDs left to the catalog (the reference reuses 1-based indices
  * as IDs, `iceberg/model.py:38,121-125` — a quirk real Iceberg forbids;
  * documented deviation per SURVEY.md §1.3). */
object IcebergEmulation {

  /** True when an Iceberg Spark runtime is on the classpath (round-3
    * verdict #6). Detection is by `Class.forName` only — no compile-time
    * Iceberg dependency, so this file builds identically with and without
    * the jars. In this sandbox it is false (no Iceberg jars in
    * /opt/spark/jars); on a cluster submitted with
    * `--packages org.apache.iceberg:iceberg-spark-runtime-...` it flips
    * true and [[writeTable]]/[[readTable]] route through a real
    * `USING iceberg` catalog table instead of the parquet emulation. */
  lazy val icebergRuntimeAvailable: Boolean =
    scala.util.Try(Class.forName(
      "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    ).isSuccess

  /** Write through the real Iceberg catalog when the runtime is present,
    * else the Hive-layout parquet emulation at `path` — with the SAME
    * SaveMode semantics on both branches (Overwrite replaces the table,
    * Append adds rows); a pipeline validated against the emulation must
    * not change row-visibility behavior in production. `fqTableName` is
    * the catalog table (e.g. `local.db.clips`); `path` is the emulation
    * fallback location. Returns the DDL it ran (real path) or would run
    * (emulated path) so callers can log lineage either way. */
  def writeTable(df: DataFrame, spec: TableSpec, fqTableName: String,
      path: String, mode: SaveMode = SaveMode.Overwrite): String = {
    require(mode == SaveMode.Overwrite || mode == SaveMode.Append,
      s"writeTable supports Overwrite/Append, got $mode")
    val ddl = createTableDdl(spec, fqTableName, bucketKey = false)
    if (icebergRuntimeAvailable) {
      val s = df.sparkSession
      if (mode == SaveMode.Overwrite) {
        // Steady state (table exists, schema matches the spec): ONE atomic
        // snapshot swap via the V2 writer's unconditional overwrite — no
        // reader observes an empty table, a mid-write failure keeps the
        // previous snapshot, and the catalog schema (INCLUDING the spec's
        // NOT NULL markers) is untouched. A drifted or missing table is
        // instead (re)created from the spec DDL — required-ness and
        // partition transforms must come from the SPEC, not from the df
        // (a `createOrReplace()` from a parquet-read df would silently
        // drop NOT NULL: DataFrame schemas arrive all-nullable) — then
        // appended; only this rare reconcile case exposes the brief empty
        // table between the two commits (round-4 advice: stale schemas
        // must not survive an Overwrite).
        if (specCompatible(s, fqTableName, spec))
          df.writeTo(fqTableName).overwrite(lit(true))
        else {
          s.sql(ddl.replace("CREATE TABLE", "CREATE OR REPLACE TABLE"))
          df.writeTo(fqTableName).append()
        }
      } else {
        // Append keeps the existing table; guard against schema drift
        // BOTH directions BEFORE writing (Iceberg would reject an
        // incompatible append mid-commit with a low-level error; the
        // library's own schema validator gives the reference's error
        // taxonomy instead — and a spec NARROWER than the live table is
        // drift too: the append would be missing columns).
        s.sql(ddl.replace("CREATE TABLE", "CREATE TABLE IF NOT EXISTS"))
        val live = s.table(fqTableName).schema
        val errs = graft.schema.SchemaValidator.validateSchema(spec, live)
        require(errs.isEmpty,
          s"append to $fqTableName blocked by schema drift: " +
            errs.map(_.errorDetails).mkString("; "))
        require(live.length == spec.columns.length,
          s"append to $fqTableName blocked by schema drift: table has " +
            s"${live.length} columns, spec declares ${spec.columns.length}")
        df.writeTo(fqTableName).append()
      }
    } else write(df, spec, path, mode)
    ddl
  }

  /** True when the live catalog table exists and carries exactly the
    * spec's column set with compatible types (validator errors empty and
    * no extra stale columns) — the condition under which an Overwrite can
    * reuse the existing table metadata in one atomic snapshot. */
  private def specCompatible(s: SparkSession, fqTableName: String,
      spec: TableSpec): Boolean =
    s.catalog.tableExists(fqTableName) && {
      val live = s.table(fqTableName).schema
      graft.schema.SchemaValidator.validateSchema(spec, live).isEmpty &&
        live.length == spec.columns.length
    }

  /** Read back what [[writeTable]] wrote: the catalog table when the
    * Iceberg runtime is present (schema carried by the catalog, snapshot
    * lineage available via `table.snapshots()`), else the schema-carrying
    * parquet read (the emulation of metadata-carried schema). */
  def readTable(spark: SparkSession, fqTableName: String, path: String,
      spec: TableSpec): DataFrame =
    if (icebergRuntimeAvailable) spark.table(fqTableName)
    else read(spark, path, spec)

  /** Spark SQL DDL type rendering for a spec column. */
  def sqlType(dt: DataType): String = dt.sql

  /** `CREATE TABLE ... USING iceberg PARTITIONED BY (...)` for a spec —
    * partition transforms: identity on declared partition columns plus an
    * optional bucket transform on the key for co-located joins at scale. */
  def createTableDdl(spec: TableSpec, fqTableName: String,
      bucketKey: Boolean = true, buckets: Int = 256,
      alias: AliasType = AliasType.Serialization): String = {
    val cols = spec.columns.map { c =>
      val notNull = if (c.nullable) "" else " NOT NULL"
      s"  ${c.nameFor(alias)} ${sqlType(c.dataType)}$notNull"
    }.mkString(",\n")
    val transforms =
      spec.partitionCols.map(identity) ++
        (if (bucketKey && spec.keyCols.nonEmpty)
          Seq(s"bucket($buckets, ${spec.keyCols.head})")
        else Nil)
    val partitionClause =
      if (transforms.nonEmpty) s"\nPARTITIONED BY (${transforms.mkString(", ")})"
      else ""
    s"CREATE TABLE $fqTableName (\n$cols\n) USING iceberg$partitionClause"
  }

  /** Write the emulated table: Hive-layout parquet partitioned by the
    * spec's partition columns. */
  def write(df: DataFrame, spec: TableSpec, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (spec.partitionCols.nonEmpty) w.partitionBy(spec.partitionCols: _*)
    else w).parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed emulated-Iceberg table — the physical realization of
    * [[createTableDdl]]'s `bucket(n, key)` partition transform, using
    * Spark's native bucketing (`bucketBy(n, key).sortBy(key).saveAsTable`).
    * A key-grouped operator over the result (uniqueness groupBy-count, a
    * co-located key join between two tables bucketed the same way) reads
    * pre-hash-partitioned, pre-sorted files and needs NO exchange — at
    * 10^12 rows that removes the uniqueness check's ONLY shuffle
    * (PlanShapeSpec pins zero exchanges). Table metadata lives in the
    * session catalog, exactly as Iceberg's bucket transform lives in its
    * catalog; on a real cluster the same write goes through the Iceberg
    * catalog DDL instead. */
  def writeBucketed(df: DataFrame, spec: TableSpec, tableName: String,
      buckets: Int = 256, mode: SaveMode = SaveMode.Overwrite,
      path: Option[String] = None): Unit = {
    require(spec.keyCols.nonEmpty, "bucketed write needs a key column")
    val key = spec.keyCols.head
    val w = df.write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    // explicit path ⇒ an EXTERNAL bucketed table (data outside the session
    // warehouse dir — e.g. under target/ so repeated driver runs don't
    // grow the repo tree); metadata still lives in the session catalog
    path.fold(w)(p => w.option("path", p)).saveAsTable(tableName)
  }

  /** Read with the spec's schema — the emulation of Iceberg's
    * metadata-carried schema: an EMPTY table (zero data files) still reads
    * with its declared columns, exactly like `table.scan()` on a fresh
    * Iceberg table (`tests/e2e/test_iceberg_polars_integration.py:126-166`).
    * Plain parquet cannot infer a schema from zero files. */
  def read(spark: SparkSession, path: String, spec: TableSpec): DataFrame =
    spark.read.schema(spec.toStructType()).parquet(path)
}
