package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed core (SURVEY.md §1.1: `Dataset[StateVector]` where type safety
  * helps; `DataFrame` where schema is dynamic). Case classes carry the
  * canonical schemas; loaders return `Dataset[T]` with bean-free Encoders. */
object Models {

  /** One event row (the engine's fact record). `tsNs` is exact epoch nanos. */
  case class Event(event_id: Long, ts_ns: Long, user_id: Long,
                   event_type: String, value: Double, props: String)

  /** The enriched flight state record (processed-schema core, reference
    * 03_create_processed_tables.sql:15-75 identity/position/movement slice). */
  case class FlightState(icao24: String, callsign: Option[String],
                         originCountry: String, ts: Long,
                         longitude: Option[Double], latitude: Option[Double],
                         baroAltitudeM: Option[Double], onGround: Boolean,
                         velocityMs: Option[Double], verticalRate: Option[Double])

  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)

  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts_ns"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .as[Event]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Document]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).as[Embedding]
  }
}
