package graft.io

import graft.TestSpark
import graft.checkpoint.ManifestCheckpoint
import graft.spec.{ColumnSpec, TableSpec}
import graft.validate._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end slice over the north-rule clips table (SURVEY.md §7.2 step 5):
  * synthesize → full constraint suite → violations + per-codec summary +
  * uniqueness + referential + drift + audio invariant + resume. */
class ClipsPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val N = 10000L
  lazy val clean = ClipsGenerator.clips(spark, N, numPartitions = 8).cache()
  lazy val dirty = ClipsGenerator.clips(spark, N, numPartitions = 8,
    withErrors = true).cache()

  test("driver contract: entry() returns rows on sf0.001") {
    val df = graft.SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("generator is deterministic and matches the input_hint schema") {
    val schema = clean.schema
    assert(schema.fieldNames.toSeq ===
      Seq("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"))
    val a = ClipsGenerator.clip(12345)
    val b = ClipsGenerator.clip(12345)
    assert(a.clip_id === "clip-000000012345")
    assert(a.transcript === b.transcript)
    assert(java.util.Arrays.equals(a.bytes, b.bytes))
    // skew axes exist: pcm_s16le ≈ 65%, 16000 Hz ≈ 60%
    val codecShare = clean.where($"codec" === "pcm_s16le").count().toDouble / N
    assert(codecShare > 0.6 && codecShare < 0.8)
    val srShare = clean.where($"sr_hz" === 16000).count().toDouble / N
    assert(srShare > 0.5 && srShare < 0.7)
  }

  test("clean table passes the full row-constraint suite") {
    val run = RowValidator.validate(clean.toDF(), ClipsGenerator.spec)
    assert(run.violations.count() === 0)
    assert(run.summary.agg(sum("error_rows")).head().getLong(0) === 0)
  }

  test("injected errors are found, keyed by clip_id (north-rule shape)") {
    val run = RowValidator.validate(dirty.toDF(), ClipsGenerator.spec)
    val v = run.violations.cache()
    // null transcripts at i%1000==7 → 10 rows
    assert(v.where($"constraint_id" === "not_null" &&
      $"column_name" === "transcript").count() === 10)
    // sr_hz=96000 at i%5000==13 → 2 rows, violating maximum AND in_set
    val sr = v.where($"column_name" === "sr_hz")
    assert(sr.where($"constraint_id" === "maximum").count() === 2)
    assert(sr.where($"constraint_id" === "in_set").count() === 2)
    assert(sr.select("observed_value").distinct().head().getString(0) === "96000")
    // violation rows carry clip_id + codec (key + partition columns)
    assert(v.columns.toSeq ===
      Seq("clip_id", "codec", "column_name", "constraint_id", "observed_value"))
    v.unpersist()
  }

  test("uniqueness check finds injected duplicate clip_ids") {
    val dups = UniquenessCheck.duplicateKeys(dirty.toDF(), Seq("clip_id"))
    // i%5000==11 → ids of 10 and 5010 duplicated (2 keys, count 2 each)
    val rows = dups.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Long]("dup_count")).toSet === Set(2L))
    assert(rows.map(_.getString(0)).toSet ===
      Set("clip-000000000010", "clip-000000005010"))
    // salted variant agrees
    val salted = UniquenessCheck.duplicateKeysSalted(dirty.toDF(), Seq("clip_id"))
    assert(salted.collect().map(r => (r.getString(0), r.getAs[Long]("dup_count")))
      .toSet === rows.map(r => (r.getString(0), r.getAs[Long]("dup_count"))).toSet)
    // HLL pre-screen: clean table ratio ≈ 1
    val (d, n) = UniquenessCheck.approxDistinctRatio(clean.toDF(), Seq("clip_id"))
    assert(math.abs(d.toDouble / n - 1.0) < 0.05)
  }

  test("salt bound holds on a narrow input: one partition, one hot key") {
    // round-5 verdict: a spark_partition_id salt collapses to ONE value on
    // a single-partition input, sending the whole hot key to one reducer.
    // The per-row salt must (a) spread a hot key across the full bucket
    // range even then, and (b) still re-sum to the exact count.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val hot = spark.range(0, 10000, 1, 1) // ONE input partition
      .select(lit("hot-key").as("k"))
    val salted = UniquenessCheck.duplicateKeysSalted(hot.toDF(), Seq("k"),
      saltBuckets = 64)
    assert(salted.collect().map(r => (r.getString(0), r.getAs[Long]("dup_count")))
      .toSeq === Seq(("hot-key", 10000L)))
    // the bound itself: the partial-count stage sees all 64 salts, so no
    // reducer ever receives more than ~1/64th of the hot key's rows
    val saltSpread = hot
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(64L)))
      .groupBy(col("_salt")).count().collect()
    assert(saltSpread.length === 64)
    assert(saltSpread.map(_.getAs[Long]("count")).max <= 10000 / 64 + 1)
  }

  test("referential check finds clips missing from the catalog") {
    val cat = ClipsGenerator.catalog(spark, N)
    val orphans = ReferentialCheck.orphans(clean.toDF(), cat, Seq("clip_id"),
      broadcastCatalog = true)
    // catalog drops i%1000==3 → 10 orphans
    assert(orphans.count() === 10)
    assert(orphans.head().getString(0).endsWith("003"))
  }

  test("drift: self-comparison is clean; shifted distribution trips KS+PSI") {
    val ref = DriftCheck.digest(clean.toDF(), "dur_ms")
    val self = DriftCheck.compare(ref, DriftCheck.digest(clean.toDF(), "dur_ms"))
    assert(!self.drifted)
    assert(self.ks < 0.02)
    // simulate drift: durations shifted +30%
    val shifted = clean.toDF().withColumn("dur_ms",
      (col("dur_ms") * 1.3).cast("int"))
    val drift = DriftCheck.compare(ref, DriftCheck.digest(shifted, "dur_ms"))
    assert(drift.drifted, s"ks=${drift.ks} psi=${drift.psi}")
    assert(drift.ks > 0.1)
    // per-group comparison returns one row per codec
    val byCodec = DriftCheck.compareGroups(clean.toDF(), "dur_ms", Seq("codec"), ref)
    assert(byCodec.count() === 5)
    assert(byCodec.where(col("drifted")).count() === 0)
  }

  test("audio invariant: clean passes, corrupted bytes + perturbed transcripts fail") {
    val cat = ClipsGenerator.catalog(spark, N)
    // sampleEvery=1 checks every row: exact expected failure counts
    val inv = AudioInvariantCheck.check(dirty.toDF(), cat, sampleEvery = 1).cache()
    // corrupted audio at i%5000==17 → 2 rows (SNR of half-zeroed sine << 30)
    // PLUS the duplicate-id rows (i%5000==11): their payload carries the
    // ORIGINAL index's tone, 1 Hz off the claimed id's reference re-synth
    // (~21 dB < the 30 dB floor). The invariant catching id/content
    // mismatches is exactly the point. (At N=10000 none of these four rows
    // draws the adpcm_ima label, so the per-codec floor doesn't bend the
    // count — the adpcm dup-pass rule is pinned by its own test below.)
    assert(inv.where(!$"snr_ok").count() === 4)
    // transcript failures: nulled i%1000==7 (10) + perturbed i%5000==19 (2)
    // + catalog-dropped i%1000==3 (10, null ref) + duplicate-id rows whose
    // transcript belongs to the original index (2)
    assert(inv.where(!coalesce($"transcript_ok", lit(false))).count() === 24)
    val cleanInv = AudioInvariantCheck.check(clean.toDF(), cat, sampleEvery = 1)
    assert(cleanInv.where(!$"snr_ok").count() === 0)
    inv.unpersist()
  }

  test("per-codec floor: a 1 Hz-off adpcm payload passes 8 dB where pcm fails 30 dB") {
    import graft.audio.{AdpcmCodec, WavCodec}
    // i=35011 is a REAL generator duplicate index (i%5000==11) whose codec
    // is adpcm_ima at the sf0.1 scale — the exact row shape where the
    // per-codec floor changes the verdict: its payload is the clip's own
    // tone, but the inherited clip_id claims a tone 1 Hz lower, costing
    // ~21 dB against the re-synthesized reference. Under adpcm_ima's
    // measured 8 dB floor that PASSES (15.1-19.0 dB band, AdpcmBandSweep);
    // the identical signal under a pcm label fails the 30 dB default.
    val i = 35011L
    val sr = ClipsGenerator.srHz(i)
    assert(sr === 16000) // dup rows always land on the hot rate
    val samples = WavCodec.synthSineSamples(ClipsGenerator.freqHz(i), 50, sr)
    val rows = Seq(
      Clip(ClipsGenerator.clipId(i - 1), AdpcmCodec.encode(sr, samples), sr,
        ClipsGenerator.durMs(i), "adpcm_ima", "t"),
      Clip(ClipsGenerator.clipId(i - 1),
        WavCodec.synthSine(ClipsGenerator.freqHz(i), 50, sr), sr,
        ClipsGenerator.durMs(i), "pcm_s16le", "t"))
    val cat = Seq((ClipsGenerator.clipId(i - 1), "t")).toDF("clip_id", "transcript")
    val inv = AudioInvariantCheck.check(rows.toDS().toDF(), cat, sampleEvery = 1)
      .collect().map(r => r.getAs[String]("codec") ->
        (r.getAs[Double]("snr_db"), r.getAs[Boolean]("snr_ok"))).toMap
    val (adSnr, adOk) = inv("adpcm_ima")
    val (pcmSnr, pcmOk) = inv("pcm_s16le")
    assert(adOk, s"adpcm dup row must pass its 8 dB floor, got $adSnr dB")
    assert(adSnr > 8.0 && adSnr < 30.0, s"expected the 1 Hz-off band, got $adSnr")
    assert(!pcmOk, s"pcm dup row must fail the 30 dB floor, got $pcmSnr dB")
    assert(pcmSnr > 8.0 && pcmSnr < 30.0, s"expected ~21 dB, got $pcmSnr")
  }

  test("checkpoint manifest: resume skips completed, detects content change") {
    val tmp = Files.createTempDirectory("graft-ckpt").toString
    val manifestDir = s"$tmp/manifest"
    val outDir = s"$tmp/out"
    val df = dirty.toDF()
    // first run: all 5 codec partitions pending
    val done1 = ManifestCheckpoint.runResumable(spark, df, ClipsGenerator.spec,
      manifestDir, outDir)
    assert(done1.toSet ===
      Set("pcm_s16le", "flac", "pcm_mulaw", "pcm_alaw", "adpcm_ima"))
    // second run: nothing pending (idempotent resume)
    val done2 = ManifestCheckpoint.runResumable(spark, df, ClipsGenerator.spec,
      manifestDir, outDir)
    assert(done2.isEmpty)
    // content change in ONE partition → only it re-runs
    val changed = df.where($"codec" =!= "pcm_alaw")
      .unionByName(df.where($"codec" === "pcm_alaw").limit(100))
    val done3 = ManifestCheckpoint.runResumable(spark, changed,
      ClipsGenerator.spec, manifestDir, outDir)
    assert(done3 === Seq("pcm_alaw"))
    // manifest carries metrics + lineage
    val m = ManifestCheckpoint.latestEntries(
      spark.read.parquet(manifestDir))
    assert(m.count() === 5)
    assert(m.columns.contains("content_hash") && m.columns.contains("error_rows"))
  }

  test("readManifest never throws: missing, malformed, and junk dirs read as None") {
    val tmp = Files.createTempDirectory("graft-ckpt-none").toString
    // missing dir (the expected first-run case — also must log no trace)
    assert(ManifestCheckpoint.readManifest(spark, s"$tmp/nope").isEmpty)
    // dir with non-manifest parquet (no partition_value column)
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$tmp/other")
    assert(ManifestCheckpoint.readManifest(spark, s"$tmp/other").isEmpty)
    // malformed path strings must not escape as exceptions either —
    // resume planning treats every unreadable manifest as "no manifest"
    assert(ManifestCheckpoint.readManifest(spark, "").isEmpty)
    assert(ManifestCheckpoint.readManifest(spark,
      "hdfs://bad_host:0:0/x").isEmpty)
  }

  test("verbatim-copy append is caught by the row count where the XOR hash cancels") {
    // the lineage fingerprint is (rows, bit_xor of whole-row hashes). XOR
    // is blind to any appended MULTISET whose own XOR is zero — the
    // smallest real case being every appended row arriving TWICE (x ⊕ x
    // cancels pairwise, so the partition hash comes back unchanged); a
    // doubled ingest of the same batch is a classic at-least-once-delivery
    // failure. Only the row count catches that growth — this is why the
    // fingerprint carries BOTH fields. (A SINGLE verbatim copy of the
    // partition flips the hash to H ⊕ H = 0 ≠ H, so that case is already
    // hash-caught; an append of genuinely new rows — q41 act 5 shifts
    // ids — flips the hash too.)
    val tmp = Files.createTempDirectory("graft-ckpt-append").toString
    val df = dirty.toDF()
    ManifestCheckpoint.runResumable(spark, df, ClipsGenerator.spec,
      s"$tmp/manifest", s"$tmp/out")
    val twice = df.where($"codec" === "pcm_mulaw")
    val grown = df.unionByName(twice).unionByName(twice)
    val fpBefore = ManifestCheckpoint.fingerprints(df, "codec")
      .where(col("partition_value") === "pcm_mulaw").collect().head
    val fpAfter = ManifestCheckpoint.fingerprints(grown, "codec")
      .where(col("partition_value") === "pcm_mulaw").collect().head
    assert(fpAfter.getAs[Long]("content_hash") ===
      fpBefore.getAs[Long]("content_hash"),
      "a doubled appended batch must cancel in XOR")
    assert(fpAfter.getAs[Long]("content_rows") ===
      3 * fpBefore.getAs[Long]("content_rows"))
    val requeued = ManifestCheckpoint.runResumable(spark, grown,
      ClipsGenerator.spec, s"$tmp/manifest", s"$tmp/out")
    assert(requeued === Seq("pcm_mulaw"),
      s"row-count change must re-queue exactly the grown partition: $requeued")
  }

  test("external fingerprint source drives resume (Iceberg metadata-lineage seam)") {
    import org.apache.spark.sql.types.StringType
    val tmp = Files.createTempDirectory("graft-ckpt-meta").toString
    val manifestDir = s"$tmp/manifest"
    val outDir = s"$tmp/out"
    val df = Seq(("a", "p1"), ("b", "p1"), ("c", "p2")).toDF("k", "part")
    val spec = TableSpec("t",
      Seq(ColumnSpec("k", StringType), ColumnSpec("part", StringType)),
      keyCols = Seq("k"), partitionCols = Seq("part"))
    // stand-in for icebergFingerprints: a (partition_value, content_rows,
    // content_hash) frame the test controls — same contract the `.files`
    // metadata table produces on a real catalog
    var fps = Seq(("p1", 2L, 11L), ("p2", 1L, 22L))
      .toDF("partition_value", "content_rows", "content_hash")
    val src = Some(() => fps)
    val r1 = ManifestCheckpoint.runResumable(spark, df, spec,
      manifestDir, outDir, src)
    assert(r1.toSet === Set("p1", "p2"))
    // unchanged metadata → no-op resume, with NO data scan needed for the diff
    assert(ManifestCheckpoint.runResumable(spark, df, spec,
      manifestDir, outDir, src).isEmpty)
    // a compaction/append flips ONLY p2's file-set hash → exactly p2 re-runs
    fps = Seq(("p1", 2L, 11L), ("p2", 1L, 99L))
      .toDF("partition_value", "content_rows", "content_hash")
    assert(ManifestCheckpoint.runResumable(spark, df, spec,
      manifestDir, outDir, src) === Seq("p2"))
    // the manifest records the SOURCE's lineage (not a data hash), next to
    // the validation metrics computed from the actual rows
    val p2 = ManifestCheckpoint.latestEntries(spark.read.parquet(manifestDir))
      .where(col("partition_value") === "p2").collect().head
    assert(p2.getAs[Long]("content_hash") === 99L)
    assert(p2.getAs[Long]("content_rows") === 1L)
    assert(p2.getAs[Long]("total_rows") === 1L)
    assert(p2.getAs[Long]("error_rows") === 0L)
  }

  test("zero-row pending partitions complete with (0,0) metrics on BOTH metrics paths") {
    import org.apache.spark.sql.types.StringType
    // a metadata-basis fingerprint can name a partition whose rows are gone
    // (files deleted, .files entry stale): it must still get a manifest
    // entry — with zero metrics — or it re-queues forever. Exercise both
    // the observe fuse (small pending set) and the >64-partition grouped
    // fallback, whose groupBy emits no row for an empty slice.
    val spec = TableSpec("t",
      Seq(ColumnSpec("k", StringType), ColumnSpec("part", StringType)),
      keyCols = Seq("k"), partitionCols = Seq("part"))
    for ((label, nParts) <- Seq("observe" -> 3, "fallback" -> 70)) {
      val tmp = Files.createTempDirectory(s"graft-ckpt-empty-$label").toString
      val rows = (0 until nParts).map(i => (s"k$i", s"p$i"))
      val df = rows.toDF("k", "part")
      val fps = (rows.map { case (_, p) => (p, 1L, 1L) } :+
        (("ghost", 1L, 7L))) // pending partition with NO rows in df
        .toDF("partition_value", "content_rows", "content_hash")
      val done = ManifestCheckpoint.runResumable(spark, df, spec,
        s"$tmp/manifest", s"$tmp/out", Some(() => fps))
      assert(done.size === nParts + 1, s"$label: $done")
      val ghost = ManifestCheckpoint.latestEntries(
        spark.read.parquet(s"$tmp/manifest"))
        .where(col("partition_value") === "ghost").collect()
      assert(ghost.length === 1, s"$label: ghost partition got no entry")
      assert(ghost.head.getAs[Long]("total_rows") === 0L)
      assert(ghost.head.getAs[Long]("content_hash") === 7L)
      // and the completed ghost does not re-queue
      assert(ManifestCheckpoint.runResumable(spark, df, spec,
        s"$tmp/manifest", s"$tmp/out", Some(() => fps)).isEmpty, label)
    }
  }

  test("NULL partition values are validated under the sentinel key, not skipped") {
    val tmp = Files.createTempDirectory("graft-ckpt-null").toString
    // null out the partition column for a deterministic slice of rows
    val withNulls = dirty.toDF().withColumn("codec",
      when(col("sr_hz") === 22050, lit(null).cast("string")).otherwise(col("codec")))
    val done = ManifestCheckpoint.runResumable(spark, withNulls,
      ClipsGenerator.spec, s"$tmp/manifest", s"$tmp/out")
    assert(done.contains(ManifestCheckpoint.NullPartitionKey),
      s"null partition not pending: $done")
    val m = ManifestCheckpoint.latestEntries(spark.read.parquet(s"$tmp/manifest"))
    val nullEntry = m.where(col("partition_value") ===
      ManifestCheckpoint.NullPartitionKey).collect()
    assert(nullEntry.length === 1)
    assert(nullEntry.head.getAs[Long]("total_rows") > 0)
    // second run: nothing pending (the null slice was genuinely recorded)
    val done2 = ManifestCheckpoint.runResumable(spark, withNulls,
      ClipsGenerator.spec, s"$tmp/manifest", s"$tmp/out")
    assert(done2.isEmpty)
  }

  test("re-validation that fixes all violations clears the stale violation files") {
    val tmp = Files.createTempDirectory("graft-ckpt2").toString
    val manifestDir = s"$tmp/manifest"
    val outDir = s"$tmp/out"
    // run 1: dirty data -> violations land for every codec
    ManifestCheckpoint.runResumable(spark, dirty.toDF(), ClipsGenerator.spec,
      manifestDir, outDir)
    val dirtyViol = spark.read.parquet(s"$tmp/out/violations").count()
    assert(dirtyViol > 0)
    // run 2: same partitions, now CLEAN (content change -> all pending).
    // Dynamic partition overwrite writes nothing for zero-violation
    // partitions; the stale files must still disappear (regression).
    ManifestCheckpoint.runResumable(spark, clean.toDF(), ClipsGenerator.spec,
      manifestDir, outDir)
    val after = try spark.read.parquet(s"$tmp/out/violations").count()
    catch { case _: Exception => 0L } // all dirs cleared -> empty read
    assert(after === 0L, s"stale violations survived a clean re-run: $after")
  }

  test("stale cleanup works through the Hadoop FS API with escaped partition values") {
    // round-2 ADVICE: the old java.io.File cleanup (a) no-oped on non-local
    // filesystems and (b) missed partition values Spark's writer escapes
    // (':', '%', '#'). Exercise both: a `file:` URI out dir + values that
    // need escaping. One partition's violations go to zero on re-run — its
    // escaped dir must be cleared.
    val tmp = Files.createTempDirectory("graft-ckpt-esc").toString
    val spec = TableSpec("t", Seq(
      ColumnSpec("id", org.apache.spark.sql.types.LongType),
      ColumnSpec("part", org.apache.spark.sql.types.StringType),
      ColumnSpec("v", org.apache.spark.sql.types.LongType,
        constraints = Seq(graft.spec.Minimum(0)))),
      keyCols = Seq("id"), partitionCols = Seq("part"))
    import spark.implicits._
    val dirtyDf = Seq(
      (1L, "a:b", -5L), (2L, "a:b", 1L), // ':' needs escaping, has violation
      (3L, "c%d#e", -1L), (4L, "plain", 7L)).toDF("id", "part", "v")
    val cleanDf = Seq(
      (1L, "a:b", 5L), (2L, "a:b", 1L),
      (3L, "c%d#e", 1L), (4L, "plain", 7L)).toDF("id", "part", "v")
    val manifestDir = s"$tmp/manifest"
    val outDir = s"file:$tmp/out" // explicit scheme → Hadoop FS resolution
    ManifestCheckpoint.runResumable(spark, dirtyDf, spec, manifestDir, outDir)
    assert(spark.read.parquet(s"$outDir/violations").count() === 2)
    // the escaped dirs exist on disk (colon → %3A etc.)
    val vioRoot = new java.io.File(s"$tmp/out/violations")
    val dirsBefore = vioRoot.listFiles().map(_.getName).filter(_.startsWith("partition_value=")).sorted
    assert(dirsBefore.exists(_.contains("%3A")), dirsBefore.mkString(","))
    ManifestCheckpoint.runResumable(spark, cleanDf, spec, manifestDir, outDir)
    val after = try spark.read.parquet(s"$outDir/violations").count()
    catch { case _: Exception => 0L }
    assert(after === 0L, s"stale escaped-partition violations survived: $after")
  }
}
