package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for append-mode parquet stores (the streaming
  * corpus sink writes a file per micro-batch per partition — after a day of
  * 1-minute batches that's thousands of slivers, and at 100 TB the
  * listing + per-file open overhead dominates reads long before the data
  * does).
  *
  * Compaction is a generation swap, the same crash-safety shape as the
  * view store: rewrite into `<dir>-gN` sized to `targetBytes` per file,
  * verify the row count, then flip the `current` pointer file — readers
  * resolve the pointer first, so they see the old or the new generation,
  * never a half-written directory. The streaming sink keeps appending to
  * the live dir between compactions; compact during a quiet window or on
  * the closed partitions of a time-partitioned store.
  */
object ParquetCompactor {

  /** Resolve the current generation dir (falls back to `dir` itself for
    * stores that never compacted).
    */
  def currentDir(spark: SparkSession, dir: String): String = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new Path(s"$dir-current")
    if (!fs.exists(ptr)) dir
    else {
      val in = fs.open(ptr)
      try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
    }
  }

  def read(spark: SparkSession, dir: String) =
    spark.read.parquet(currentDir(spark, dir))

  /** Atomically point `dir`'s generation pointer at `target` (tmp write +
    * rename — the [[compact]] flip, exposed for callers that build a new
    * generation themselves, e.g. the drift-triggered index rebuild).
    * Readers resolve the pointer first, so they see the old or the new
    * generation, never a half-built one.
    */
  def flipPointer(spark: SparkSession, dir: String, target: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$dir-current.tmp${System.nanoTime()}")
    val os = fs.create(tmp, true)
    try os.write(target.getBytes("UTF-8")) finally os.close()
    if (!fs.rename(tmp, new Path(s"$dir-current"))) {
      fs.delete(new Path(s"$dir-current"), false)
      fs.rename(tmp, new Path(s"$dir-current"))
    }
    ()
  }

  /** Reset a store to its raw dir: delete the generation pointer and GC
    * every `-gN` generation — what a REBUILD over a previously-compacted
    * dir must do first, or its fresh write to the raw path would be
    * invisible behind the stale pointer (readers resolve the pointer).
    */
  def resetPointer(spark: SparkSession, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$dir-current"), false)
    val parent = new Path(dir).getParent
    val prefix = new Path(dir).getName + "-g"
    if (parent != null && fs.exists(parent))
      fs.listStatus(parent).filter(_.getPath.getName.startsWith(prefix))
        .foreach(st => fs.delete(st.getPath, true))
    ()
  }

  /** Tiny long-valued marker file (the fold watermark the index stores
    * keep): written via tmp + rename like the generation pointer.
    */
  def writeMarker(spark: SparkSession, path: String, value: Long): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$path.tmp")
    val os = fs.create(tmp, true)
    try os.write(value.toString.getBytes("UTF-8")) finally os.close()
    if (!fs.rename(tmp, new Path(path))) {
      fs.delete(new Path(path), false)
      fs.rename(tmp, new Path(path))
    }
    ()
  }

  def readMarker(spark: SparkSession, path: String): Option[Long] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) None
    else {
      val in = fs.open(new Path(path))
      try Some(scala.io.Source.fromInputStream(in).mkString.trim.toLong)
      finally in.close()
    }
  }

  def deleteMarker(spark: SparkSession, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), false)
    ()
  }

  /** True iff the store's current generation holds at least one data file
    * (a zero-row partitioned write leaves no part files — reading it
    * would fail schema inference, so compaction must no-op).
    */
  private def hasDataFiles(fs: org.apache.hadoop.fs.FileSystem, p: Path): Boolean = {
    if (!fs.exists(p)) return false
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      if (it.next().getPath.getName.startsWith("part-")) return true
    }
    false
  }

  /** One compaction round: returns the new generation path. `targetBytes`
    * sizes output files from the INPUT's total byte size — an estimate
    * (recompression changes it), which is all file sizing needs.
    *
    * `partitionCols` + `rewrite` extend the same generation-swap to
    * PARTITIONED stores (the text index's postings): the rewrite hook
    * reshapes the frame (e.g. folds `b=` ingest generations to one) and
    * the output keeps the store's partition layout; row-count verify and
    * the pointer flip are unchanged. Rewrites must be row-count-preserving
    * — the verify enforces it.
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              partitionCols: Seq[String] = Nil,
              rewrite: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity): String = {
    val src = currentDir(spark, dir)
    val fs = new Path(src).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hasDataFiles(fs, new Path(src))) return src // empty store: no-op
    val totalBytes = fs.listStatus(new Path(src)).toSeq
      .filter(_.getPath.getName.startsWith("part-")).map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // monotonic generation counter parsed from the current dir — wall-clock
    // names collide for back-to-back rounds
    val gen = if (src == dir) 1L
      else src.substring(src.lastIndexOf("-g") + 2).toLong + 1L
    val out = s"$dir-g$gen"
    val df = rewrite(spark.read.parquet(src))
    if (partitionCols.isEmpty)
      df.coalesce(nFiles).write.mode("overwrite").parquet(out)
    else
      df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(out)
    // verify before publishing: a lost row means we keep the old generation
    val (inRows, outRows) = (df.count(), spark.read.parquet(out).count())
    if (inRows != outRows) {
      fs.delete(new Path(out), true)
      sys.error(s"compaction row mismatch: $inRows != $outRows — old generation kept")
    }
    val tmp = new Path(s"$dir-current.tmp$gen")
    val os = fs.create(tmp, true)
    try os.write(out.getBytes("UTF-8")) finally os.close()
    if (!fs.rename(tmp, new Path(s"$dir-current"))) {
      fs.delete(new Path(s"$dir-current"), false)
      fs.rename(tmp, new Path(s"$dir-current"))
    }
    // old generation is unreachable from the pointer now; GC it unless it
    // is the original live dir (a streaming sink may still append there)
    if (src != dir) fs.delete(new Path(src), true)
    out
  }

  /** In-place compaction of one CLOSED partition directory of a
    * partitioned append store (the `b=`/`day=` shape of the import feed
    * and corpus sinks — a partition below the append frontier never
    * receives new files, so it can be rewritten without racing the
    * writer). Rewrites the partition's files into `tmpRoot/<name>`
    * (underscore-prefixed roots are invisible to Spark's partition
    * discovery), verifies the row count, then swaps delete-then-rename.
    * A crash between the two steps leaves the verified copy in `tmpRoot`;
    * [[recoverInPlace]] completes the swap — callers run it before
    * reading or compacting (ImportFeed does both).
    */
  def compactPartitionInPlace(spark: SparkSession, partDir: String,
                              tmpRoot: String): Unit = {
    val part = new Path(partDir)
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(tmpRoot, part.getName)
    val df = spark.read.parquet(partDir)
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val (inRows, outRows) =
      (df.count(), spark.read.parquet(tmp.toString).count())
    if (inRows != outRows) {
      fs.delete(tmp, true)
      sys.error(s"compaction row mismatch: $inRows != $outRows — $partDir kept")
    }
    fs.delete(part, true)
    if (!fs.rename(tmp, part))
      sys.error(s"compaction swap rename failed: $tmp -> $part")
  }

  /** Complete any swap [[compactPartitionInPlace]] crashed in the middle
    * of: every child of `tmpRoot` whose target partition is MISSING is
    * the verified compacted copy of a deleted partition — rename it into
    * place; children whose target exists are stale rewrite leftovers —
    * delete them. No-op when `tmpRoot` doesn't exist.
    */
  def recoverInPlace(spark: SparkSession, dir: String, tmpRoot: String): Unit = {
    val root = new Path(tmpRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) {
      fs.listStatus(root).foreach { s =>
        val target = new Path(dir, s.getPath.getName)
        // only partition DIRS swap in; stray files (_SUCCESS markers from a
        // crashed batched write) are never partition payloads — drop them
        if (s.isDirectory && !fs.exists(target)) { fs.rename(s.getPath, target); () }
        else fs.delete(s.getPath, true)
      }
      fs.delete(root, true)
      ()
    }
  }
}
