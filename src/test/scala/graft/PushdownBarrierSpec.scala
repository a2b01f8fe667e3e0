package graft

import org.apache.spark.sql.functions._
import graft.expressions.PushdownBarrier
import graft.expressions.PushdownBarrier.{barrier, barrieredFilter}

/** PushdownBarrier semantics: exact value pass-through on both evaluation
  * paths, and the one behavior it exists for — keeping a filter above the
  * projection that computes its input.
  */
class PushdownBarrierSpec extends SparkSpec {
  import spark.implicits._

  test("barrier is a value-exact pass-through (codegen and interpreted)") {
    val df = Seq(Some(1), None, Some(-3)).toDF("x")
    val out = df.select(barrier($"x" > 0).as("b"), ($"x" > 0).as("e"))
      .collect()
    assert(out.forall(r => r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getBoolean(0) == r.getBoolean(1))))
    // interpreted path
    val lit1 = org.apache.spark.sql.catalyst.expressions.Literal(7)
    assert(PushdownBarrier(lit1).eval(null) === 7)
  }

  test("barrieredFilter keeps rows identical to a plain filter") {
    val df = spark.range(1000).toDF("id").withColumn("y", $"id" % 7)
    val plain = df.filter($"y" === 3).select($"id").as[Long].collect().toSet
    val barred = barrieredFilter(df, $"y" === 3).select($"id").as[Long].collect().toSet
    assert(barred === plain)
  }

  test("the barrier field survives optimization and pins the Filter above the Project") {
    val df = spark.range(100).toDF("id")
      .select($"id", ($"id" * 2).as("d"))
    val plan = barrieredFilter(df, $"d" > 10).queryExecution.optimizedPlan.toString
    // the filter must reference the derived attribute, not a substituted
    // (id * 2) tree pushed beneath the projection
    val filterLine = plan.linesIterator.find(_.contains("Filter")).get
    assert(!filterLine.contains("* 2"), s"predicate was substituted: $filterLine")
    assert(plan.contains("pushdownbarrier") || filterLine.contains("__pushdown_barrier"),
      s"barrier optimized away:\n$plan")
  }
}
