package graft.ops

/** Shared fingerprinting for PERSISTED layouts (index tables, codebooks,
  * partitioned corpora): a layout is only valid together with the code
  * and the source data that wrote it, so its name carries a digest of
  * both. Extracted from `graft.sim.Similarity` when the text-side band
  * index (q151) needed the same contract.
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

  /** Cheap source-data fingerprint: path + size + mtime (the driver
    * regenerates test data in place between rounds — mtime catches it). */
  def fileFp(p: String): String = {
    val f = new java.io.File(p)
    s"$p|${f.length}|${f.lastModified}"
  }
}
