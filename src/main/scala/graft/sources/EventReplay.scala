package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timed `.evt` replay into Structured Streaming — the reference's
  * scenario runner semantics (event_file.rs replay: BATCH n delays
  * the following events n ms from stream start), re-expressed for a
  * micro-batch engine:
  *
  *  - every BATCH group becomes its own staged file, stamped with
  *    event-time `ts = base + delay_ms` — so the *watermark* sees
  *    exactly the timing the .evt encodes;
  *  - file modification times preserve BATCH order, and the stream
  *    reads with `maxFilesPerTrigger=1`, so each BATCH is its own
  *    micro-batch (the micro-batch analog of the reference's timed
  *    injection);
  *  - optionally, [[releasePaced]] renames the staged files into the
  *    watched directory on a wall-clock schedule scaled from the
  *    .evt delays — a true rate-controlled source for soak runs.
  *
  * Staging loops over BATCH groups on the driver; an .evt scenario is
  * a test artifact (tens of batches), not a data path — the data path
  * is the stream reader, which is ordinary distributed file streaming.
  */
object EventReplay {

  /** Default replay epoch: 2024-01-01T00:00:00Z, matching nothing in
    * the data on purpose (scenario time is relative).
    */
  val DefaultBaseEpochMs: Long = 1704067200000L

  /** files = (path, delayMs) in BATCH order. */
  final case class Staged(dir: String, files: Seq[(String, Long)], nBatches: Int)

  /** Parse `evtPath` and write one parquet file per BATCH group under
    * `dir` (or `dir/.staged` when `paced`), named and modstamped in
    * BATCH order. Columns: event_id (line order), event_type, ts
    * (event time = base + delay_ms), delay_ms, fields.
    * When `sentinel`, a final `__sentinel` event 2h past the last
    * batch closes every window/watermark for append-mode sinks.
    */
  def stage(
      spark: SparkSession,
      evtPath: String,
      dir: String,
      baseEpochMs: Long = DefaultBaseEpochMs,
      sentinel: Boolean = true,
      paced: Boolean = false,
      fileIdxOffset: Int = 0,
      idOffset: Long = 0L,
      delayOffsetMs: Long = 0L): Staged = {
    val target = new java.io.File(dir)
    target.mkdirs()
    val stagedDir = if (paced) new java.io.File(dir, ".staged") else target
    stagedDir.mkdirs()
    val parsed = EventFile.read(spark, evtPath)
      .withColumn("delay_ms", col("delay_ms") + lit(delayOffsetMs))
      .withColumn("ts", timestamp_millis(lit(baseEpochMs) + col("delay_ms")))
      .select((col("line_no") + lit(idOffset)).as("event_id"),
        col("event_type"),
        col("ts"), col("delay_ms"), col("fields"), col("fields_raw"))
      .cache()
    val delays = parsed.select("delay_ms").distinct()
      .orderBy("delay_ms").collect().map(_.getLong(0))
    val lastMs = delays.lastOption.getOrElse(delayOffsetMs)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_replay_stage_").toString
    def writeOne(df: DataFrame, idx: Int): String = {
      val out = s"$tmp/b$idx"
      df.coalesce(1).write.mode("overwrite").parquet(out)
      val part = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(stagedDir,
        f"batch_${idx + fileIdxOffset}%05d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // FileStreamSource orders by (modTime, path): pin both
      dest.setLastModified(baseEpochMs + (idx + fileIdxOffset) * 1000L)
      dest.getPath
    }
    val files = delays.zipWithIndex.map { case (d, i) =>
      (writeOne(parsed.filter(col("delay_ms") === d), i), d)
    }.toSeq
    val sentinelFiles = if (sentinel) {
      val s = spark.range(1).select(
        lit(-1L).as("event_id"),
        lit("__sentinel").as("event_type"),
        timestamp_millis(lit(baseEpochMs + lastMs + 7200000L)).as("ts"),
        lit(lastMs + 7200000L).as("delay_ms"),
        map().cast("map<string,string>").as("fields"),
        map().cast("map<string,string>").as("fields_raw"))
      Seq((writeOne(s, delays.length), lastMs + 7200000L))
    } else Nil
    parsed.unpersist()
    Staged(dir, files ++ sentinelFiles, delays.length)
  }

  /** Append a later `.evt` phase to an already-staged directory: new
    * file names/modtimes sort after the existing batches, event_ids
    * continue in a disjoint range, and event time continues after
    * `afterDelayMs` — so a RESTARTED streaming query (same checkpoint)
    * consumes exactly the new files as its next micro-batches. This
    * is the reference's two-phase checkpoint scenario staging
    * (tests/scenarios/checkpoint_*_phase{1,2}.evt).
    */
  def stagePhase(
      spark: SparkSession,
      evtPath: String,
      staged: Staged,
      phase: Int,
      afterDelayMs: Long,
      sentinel: Boolean,
      baseEpochMs: Long = DefaultBaseEpochMs): Staged = {
    val more = stage(spark, evtPath, staged.dir, baseEpochMs,
      sentinel = sentinel,
      fileIdxOffset = phase * 10000,
      idOffset = phase * 1000000000L,
      delayOffsetMs = afterDelayMs)
    Staged(staged.dir, staged.files ++ more.files,
      staged.nBatches + more.nBatches)
  }

  /** Seed a spool directory with a ZERO-ROW staged file — the deploy
    * shape of the pipeline-management API, where a streaming query
    * must start on an empty event log (the file source needs at least
    * one file to carry the schema) and later injects append via
    * [[stagePhase]].
    */
  def stageEmpty(
      spark: SparkSession,
      dir: String,
      baseEpochMs: Long = DefaultBaseEpochMs): Staged = {
    val target = new java.io.File(dir)
    target.mkdirs()
    val empty = spark.range(0).select(
      lit(0L).as("event_id"),
      lit("").as("event_type"),
      timestamp_millis(lit(baseEpochMs)).as("ts"),
      lit(0L).as("delay_ms"),
      map().cast("map<string,string>").as("fields"),
      map().cast("map<string,string>").as("fields_raw"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_replay_seed_").toString
    empty.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dest = new java.io.File(target, "batch_00000.parquet")
    java.nio.file.Files.move(part.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dest.setLastModified(baseEpochMs)
    Staged(dir, Seq((dest.getPath, 0L)), 0)
  }

  /** Open the staged directory as a stream, one BATCH per micro-batch. */
  def readStream(spark: SparkSession, staged: Staged): DataFrame = {
    val schema = spark.read.parquet(staged.files.head._1).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.dir)
  }

  /** Wall-clock-paced release for a `stage(..., paced = true)` result:
    * a daemon thread renames each staged file into the watched dir at
    * `delay_ms * timeScale` ms after start (rename is atomic on a
    * local fs, which is what FileStreamSource requires). Returns the
    * thread; join it before asserting end-of-stream.
    */
  def releasePaced(staged: Staged, timeScale: Double): Thread = {
    val t = new Thread(() => {
      val start = System.nanoTime()
      staged.files.foreach { case (f, delayMs) =>
        val src = new java.io.File(f)
        val dueMs = (delayMs * timeScale).toLong
        val elapsedMs = (System.nanoTime() - start) / 1000000L
        if (dueMs > elapsedMs) Thread.sleep(dueMs - elapsedMs)
        java.nio.file.Files.move(src.toPath,
          new java.io.File(staged.dir, src.getName).toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    })
    t.setDaemon(true)
    t.start()
    t
  }
}
