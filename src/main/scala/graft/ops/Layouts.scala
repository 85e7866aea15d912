package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared fingerprinting AND filesystem plumbing for PERSISTED layouts
  * (index tables, codebooks, partitioned corpora): a layout is only valid
  * together with the code and the source data that wrote it, so its name
  * carries a digest of both; and every existence check / crash-atomic
  * publish must ride the Hadoop `FileSystem` of the path's own scheme —
  * `java.io.File` silently answers "absent" for any non-local URI
  * (`file:`, `hdfs:`, `s3a:`), which for a tombstone sidecar means
  * serving deleted rows with no error. Extracted from
  * `graft.sim.Similarity` when the text-side band index (q151) needed the
  * same contract; the FS helpers consolidate the r15 directory-layout
  * plumbing (the round-15 verdict's portability findings).
  */
object Layouts {

  /** Included in every persisted-layout fingerprint; bump when
    * layout-producing code changes semantics (signature family, assignment
    * tiebreak, schema) — a /tmp- or catalog-persisted layout built by
    * OLDER code must never be silently served to newer probe code on a
    * long-lived machine. */
  val Version = "v1"

  /** Short stable digest of the identifying parts. */
  def tag(parts: String*): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("|").getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString

  private def hconf(spark: SparkSession) =
    spark.sparkContext.hadoopConfiguration

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(hconf(spark))

  /** Scheme-aware existence check — THE layout existence primitive.
    * Every read-path decision that can silently mis-serve on a wrong
    * answer (tombstone sidecars above all) must go through here, never
    * `java.io.File`. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    fsOf(spark, p).exists(p)
  }

  /** A subdir is committed iff its writer's `_SUCCESS` marker landed —
    * the single-write-per-subdir crash-safety convention (r13 rule (c)). */
  def committed(spark: SparkSession, path: String): Boolean =
    exists(spark, s"$path/_SUCCESS")

  /** Recursive delete (no-op when absent). */
  def delete(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Child entry NAMES of a directory (empty when absent) — scheme-aware
    * like every other layout primitive; used to count rebuild byproducts
    * (`_rb<N>` generations, orphaned-tombstone slots) so the maintenance
    * schedule can surface reap/reissue debt instead of letting it accrue
    * invisibly beside the layouts. */
  def listChildren(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) fs.listStatus(p).toSeq.map(_.getPath.getName)
    else Seq.empty
  }

  /** True iff `path` exists and holds at least one parquet DATA file —
    * the ONE definition of "this sidecar/slot is readable" (r17): a
    * legacy writer can leave a `_SUCCESS`-only dir, which `exists`
    * blesses but `spark.read.parquet` rejects with UNABLE_TO_INFER_SCHEMA
    * — and a reader that gates on `exists` alone wedges permanently on
    * such a dir (serving, maintenance facts, and the very repair tools
    * alike). Every sidecar read and preserve/retire decision must gate
    * on THIS, not on `exists`. RECURSIVE (r18): a sidecar/slot whose
    * data files are nested (e.g. ever written partitioned) must read as
    * non-empty — callers like the preserve/purge paths DELETE on a
    * false verdict, so a direct-children-only scan would silently
    * destroy marks the moment a sidecar layout gains a partition level.
    * The walk skips HIDDEN children (`_`/`.` prefixes, matching Spark's
    * reader path filter): a crashed first write leaves only
    * `_temporary/**/part-*.parquet`, which the reader ignores — counting
    * it as data would wedge every guarded reader on exactly the husk
    * this predicate exists to classify. The TOP path itself may be
    * `_`-prefixed (the epoch sidecar is); only descendants filter. */
  def hasParquetData(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    def walk(dir: Path): Boolean = {
      val st = fs.listStatus(dir).filterNot(s => hidden(s.getPath.getName))
      st.exists(s => !s.isDirectory && s.getPath.getName.endsWith(".parquet")) ||
        st.exists(s => s.isDirectory && walk(s.getPath))
    }
    fs.exists(p) && walk(p)
  }

  /** Crash-atomic publish of a multi-step directory-layout build: when
    * `idxDir` is absent, run `build` against a fresh `<idxDir>.build`
    * staging dir (a crashed prior attempt is deleted first) and rename it
    * into place only after the LAST step — a failure anywhere leaves only
    * the staging dir, so a re-invocation rebuilds from scratch instead of
    * serving a partial layout. Rename is atomic on local FS and HDFS; on
    * object stores rename is a copy, where the per-subdir `_SUCCESS`
    * gating ([[committed]]) is the actual read-path guard — document any
    * new layout's read path against that. */
  def buildIfAbsent(spark: SparkSession, idxDir: String)
                   (build: String => Unit): Unit = {
    val p = new Path(idxDir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) {
      val b = new Path(idxDir + ".build")
      if (fs.exists(b)) fs.delete(b, true)
      build(b.toString)
      if (!fs.rename(b, p)) sys.error(s"atomic publish of $idxDir failed")
    }
  }

  /** Catalog-table twin of [[buildIfAbsent]] — the staging-NAME +
    * `ALTER TABLE RENAME` rule (r13, q145): when `table` is absent, run
    * the multi-step `build` (create + appends + tombstones) against
    * `<table>_build` — a crashed prior attempt is dropped first; these
    * are external tables, so the drop leaves the crashed attempt's files
    * orphaned in its own temp dir, never under the live name — and
    * rename into place only after the LAST step. `tableExists` flips
    * only once everything landed, so a crash mid-build can never leave a
    * half-built table that later invocations treat as complete. */
  def buildTableIfAbsent(spark: SparkSession, table: String)
                        (build: String => Unit): Unit =
    if (!spark.catalog.tableExists(table)) {
      val staging = s"${table}_build"
      if (spark.catalog.tableExists(staging))
        spark.sql(s"DROP TABLE $staging")
      build(staging)
      spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    }

  /** ONE-LINE MARKER files — the crash-protocol primitive behind the
    * rebuild retire markers (`<base>_rb_retiring`, `<dir>.retiring_from`):
    * a tiny file recording the name/path a multi-step protocol is about
    * to consume, written before the destructive step and deleted after
    * it, so every crash window carries evidence naming its exact target.
    * One definition (the r16 consolidation rule): a marker-format fix
    * must not have to land in two packages. */
  def writeMarkerFile(spark: SparkSession, marker: String,
                      content: String): Unit = {
    val p = new Path(marker)
    val out = fsOf(spark, p).create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** The marker's content, trimmed; None when absent or blank. */
  def readMarkerFile(spark: SparkSession, marker: String): Option[String] = {
    val p = new Path(marker)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      .filter(_.nonEmpty)
    finally in.close()
  }

  def deleteMarkerFile(spark: SparkSession, marker: String): Unit = {
    val p = new Path(marker)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) fs.delete(p, false)
  }

  /** Cheap source-data fingerprint: path + size + mtime (the driver
    * regenerates test data in place between rounds — mtime catches it).
    * Scheme-aware like every other layout primitive; for local plain
    * paths the emitted (len, mtime-millis) are identical to the old
    * `java.io.File` values, so existing layout tags are unchanged. */
  def fileFp(p: String): String = {
    val path = new Path(p)
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = path.getFileSystem(conf)
    if (fs.exists(path)) {
      val st = fs.getFileStatus(path)
      s"$p|${st.getLen}|${st.getModificationTime}"
    } else s"$p|0|0"
  }
}
