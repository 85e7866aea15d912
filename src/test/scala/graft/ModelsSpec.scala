package graft

import graft.model.Models

class ModelsSpec extends SparkSpecBase {

  test("typed Dataset loaders round-trip the schemas") {
    import spark.implicits._
    val ev = Models.events(spark, Sf0001)
    assert(ev.head().event_type.nonEmpty)
    // typed transformations compose: filter + groupByKey + mapGroups
    val perUser = ev.filter(_.value > 50)
      .groupByKey(_.user_id)
      .mapGroups((uid, it) => (uid, it.length))
      .collect().toMap
    assert(perUser.nonEmpty && perUser.values.forall(_ > 0))
    assert(Models.documents(spark, Sf0001).head().text.nonEmpty)
    assert(Models.embeddings(spark, Sf0001).head().embedding.length === 64)
  }

  test("sessionize: monotone session ids, gaps split sessions") {
    import org.apache.spark.sql.functions._
    val out = graft.ts.TimeSeries.q42Sessionize(spark, Sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= 1)
      assert(r.getAs[Long]("max_session_events") >= 1)
    }
  }
}
