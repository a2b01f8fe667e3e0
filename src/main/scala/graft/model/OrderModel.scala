package graft.model

import org.apache.spark.sql.types._

/** Schemas for the order-record data model of the reference pipeline.
  *
  * The reference ingests schema-less JSON "order" records (ref:
  * src/app/order_validator.py:39-45) and emits a fixed 6-field struct
  * wrapped in a Kafka Connect envelope (ref: src/app/order_validator.py:
  * 108-123). We model ingest as an all-string loosely-typed struct —
  * matching the reference's duck typing, where numeric-ness is decided by
  * a parse attempt, not by the ingest schema — and egress as the declared
  * envelope struct.
  */
object OrderModel {

  /** Required fields, in the reference's declaration order (ref:
    * src/app/order_validator.py:39-45). Order matters: the
    * "Missing required fields: …" message lists them in this order.
    */
  val RequiredFields: Seq[String] =
    Seq("order_id", "product_name", "quantity", "price", "order_date")

  /** Loose ingest schema: every field a string; absent JSON keys → null.
    * `from_json` in PERMISSIVE mode reproduces the reference's
    * null-on-corrupt deserializer (ref: src/app/order_validator.py:57-69).
    */
  val rawOrderSchema: StructType = StructType(
    RequiredFields.map(f => StructField(f, StringType, nullable = true))
  )

  /** Typed shape after validation/enrichment — mirrors the envelope's
    * declared struct (ref: src/app/order_validator.py:110-121): order_id
    * normalized to string, quantity/price/total_price double.
    */
  val enrichedOrderSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("product_name", StringType),
    StructField("quantity", DoubleType),
    StructField("price", DoubleType),
    StructField("order_date", StringType),
    StructField("total_price", DoubleType)
  ))

  /** Output column names of the enriched payload, in envelope order. */
  val EnrichedFields: Seq[String] = enrichedOrderSchema.fieldNames.toSeq
}
