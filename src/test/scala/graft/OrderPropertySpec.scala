package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.OrderPipeline

/** Property-based testing (SURVEY §5.3): a generator mirroring the
  * reference's random_orders_generator (ref: src/data/
  * random_orders_generator.py:27-60) plus mutation operators (drop field,
  * negate, stringify, epoch-days dates, garbage), checked against an
  * independent row-by-row Scala oracle that re-implements the Python
  * validator's semantics directly (not via Spark).
  */
class OrderPropertySpec extends SparkSpec {
  import spark.implicits._

  // ---- generator (mirrors the reference fixture's shape + mutations) ----
  private val adjectives = Seq("Fantastic", "Refined", "Practical", "Small", "Generic", "Elegant")
  private val materials = Seq("Plastic", "Wooden", "Frozen", "Soft", "Steel")
  private val products = Seq("Lamp", "Salad", "Gloves", "Towels", "Pants", "Hat")

  private case class Raw(order_id: Option[String], product_name: Option[String],
      quantity: Option[String], price: Option[String], order_date: Option[String])

  private val genBase: Gen[Raw] = for {
    id <- Gen.choose(1, 1000000)
    a <- Gen.oneOf(adjectives); m <- Gen.oneOf(materials); p <- Gen.oneOf(products)
    q <- Gen.choose(1, 100)
    pr <- Gen.choose(10000, 200000).map(c => c / 100.0)
    y <- Gen.choose(2000, 2024); mo <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
  } yield Raw(Some(id.toString), Some(s"$a $m $p"), Some(q.toString),
    Some(pr.toString), Some(f"$y-$mo%02d-$d%02d"))

  private val genMutated: Gen[Raw] = genBase.flatMap { r =>
    val epochDays = Gen.choose(0, 20000)
      .pureApply(Gen.Parameters.default, Seed(r.hashCode.toLong)).toString
    Gen.oneOf[Raw](
      r, r, // keep majority valid
      r.copy(quantity = r.quantity.map("-" + _)),
      r.copy(price = r.price.map("-" + _)),
      r.copy(quantity = Some("oops")),
      r.copy(price = Some("NaNish")),
      r.copy(quantity = Some("1e2")),        // scientific notation parses
      r.copy(price = Some(" 12.5 ")),        // whitespace-padded parses (both trim)
      r.copy(quantity = Some("12,5")),       // comma decimal does NOT parse
      r.copy(price = Some("1.7976931348623157E308")), // max double, valid
      r.copy(quantity = None),
      r.copy(order_id = None),
      r.copy(order_date = Some(epochDays)),
      r.copy(order_date = None),
      r.copy(product_name = None, price = Some("x"))
    )
  }

  // ---- independent oracle: the Python validator's semantics in plain Scala
  private def oracle(r: Raw): (Boolean, Option[String], Option[Double]) = {
    val fields = Seq(
      "order_id" -> r.order_id, "product_name" -> r.product_name,
      "quantity" -> r.quantity, "price" -> r.price, "order_date" -> r.order_date)
    val missing = fields.collect { case (n, None) => n }
    if (missing.nonEmpty) return (false, Some(s"Missing required fields: ${missing.mkString(", ")}"), None)
    def num(s: String): Option[Double] = s.toDoubleOption // Spark try_cast ≈ Scala toDoubleOption here
    val errs = Seq(
      num(r.price.get) match {
        case None => Some(s"Field 'price' should be a number, but is of value: ${r.price.get}")
        case Some(v) if v < 0 => Some("Field 'price' should be non-negative")
        case _ => None
      },
      num(r.quantity.get) match {
        case None => Some(s"Field 'quantity' should be a number, but is of value: ${r.quantity.get}")
        case Some(v) if v < 0 => Some("Field 'quantity' should be non-negative")
        case _ => None
      }).flatten
    if (errs.nonEmpty) (false, Some(errs.mkString("; ")), None)
    else {
      val prod = num(r.quantity.get).get * num(r.price.get).get
      // bround passes non-finite values through; BigDecimal would throw
      val t = if (prod.isInfinite || prod.isNaN) prod
        else BigDecimal(prod).setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      (true, None, Some(t))
    }
  }

  test("pipeline ≡ independent oracle on 2000 generated+mutated records (3 seeds)") {
    for (seed <- Seq(42L, 1337L, 20260812L)) {
      val rows = Gen.listOfN(2000, genMutated)
        .pureApply(Gen.Parameters.default, Seed(seed))
        .zipWithIndex.map { case (r, i) => (i.toLong, r) }
      val df = rows.map { case (i, r) =>
        (i, r.order_id.orNull, r.product_name.orNull, r.quantity.orNull, r.price.orNull, r.order_date.orNull)
      }.toDF("row_id", "order_id", "product_name", "quantity", "price", "order_date")
      // sub-transforms keep pass-through columns (row_id); processOrders'
      // final projection (P1) would drop them
      val got = OrderPipeline.normalizeOrderDate(
          OrderPipeline.enrichOrders(OrderPipeline.validateOrders(df)))
        .select($"row_id", $"is_valid", $"error_message", $"total_price")
        .as[(Long, Boolean, Option[String], Option[Double])]
        .collect().map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      rows.foreach { case (i, r) =>
        val exp = oracle(r)
        val act = got(i)
        assert(act._1 === exp._1, s"validity mismatch seed=$seed row=$i raw=$r")
        assert(act._2 === exp._2, s"error mismatch seed=$seed row=$i raw=$r")
        assert(act._3 === exp._3, s"total mismatch seed=$seed row=$i raw=$r")
      }
      // structural invariants: routed exactly once; total iff valid
      val out = OrderPipeline.processOrders(df.drop("row_id")).cache()
      val (v, inv) = OrderPipeline.route(out)
      assert(v.count() + inv.count() === 2000)
      assert(out.filter($"is_valid" =!= $"total_price".isNotNull).count() === 0)
    }
  }
}
