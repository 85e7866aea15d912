package graft

import org.apache.spark.sql.functions._

/** Loader robustness against driver regenerations of `documents.parquet`
  * and the embeddings ID column — the EventsEncodingSpec treatment for the
  * two loaders VERDICT r8 flagged as not yet encoding-pinned.
  *
  * Committed fixture `doc_enc/int32_large` carries every narrowing a
  * pandas/pyarrow producer plausibly ships: int32 `doc_id`/`n_chars`,
  * `large_string` text, dictionary-encoded `lang`/`source`.
  * `emb_enc/int32_id` carries an int32 `vec_id` (+ int64 label) next to the
  * float32 vectors. The loaders must normalize to the 64-bit id contract
  * every `getLong` consumer and committed-id arithmetic assumes, without
  * touching /root/testdata.
  */
class DocumentsEncodingSpec extends SparkSpecBase {

  private def fixtureDir(res: String, file: String): String =
    new java.io.File(getClass.getClassLoader
      .getResource(s"$res/$file").toURI).getParentFile.getPath

  test("Tables.documents normalizes an int32/large_string/dictionary " +
      "regeneration to the long-id contract") {
    val dir = fixtureDir("doc_enc/int32_large", "documents.parquet")
    val df = Tables.documents(spark, dir)
    assert(df.schema("doc_id").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(df.schema("n_chars").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(df.schema("text").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(df.schema("source").dataType ===
      org.apache.spark.sql.types.StringType)
    // the getLong consumer path and id arithmetic (plants use doc_id % k)
    val rows = df.select(col("doc_id"), col("n_chars"), col("text"))
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(rows.forall(r => r.getLong(1) === r.getString(2).length.toLong))
    // a representative text consumer runs end-to-end on the fixture: the
    // native shingle kernel + token stats ride the normalized schema
    val toks = graft.text.TextOps.shingleRows(df, 1, extra = Seq("source"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(toks(1L) === 3L && toks(6L) === 5L)
  }

  test("Tables.embeddings normalizes an int32 vec_id regeneration to the " +
      "long-id contract") {
    val dir = fixtureDir("emb_enc/int32_id", "embeddings.parquet")
    val df = Tables.embeddings(spark, dir)
    assert(df.schema("vec_id").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(df.schema("embedding").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, true))
    val ids = df.select(col("vec_id")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }
}
