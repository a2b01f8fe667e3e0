package graft

import org.apache.spark.sql.functions._
import graft.tools.ScaleProbe

/** Shape pins for the scale-probe generator: the probe's exponent is only
  * meaningful if both scales draw from the same family, so the generator's
  * invariants (token-count range, vocab growth, lang/source fan-out,
  * embedding geometry) are pinned here at a small n.
  */
class ScaleProbeSpec extends SparkSpec {
  import spark.implicits._

  test("synthDocuments: driver-table shape — columns, token range, lang/source fan-out") {
    val d = ScaleProbe.synthDocuments(spark, 400).cache()
    assert(d.columns.toSeq === Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(d.count() === 400)
    val tokCounts = d.select(size(split(col("text"), " ")).as("nt"))
      .agg(min("nt"), max("nt")).head()
    assert(tokCounts.getInt(0) >= 8 && tokCounts.getInt(1) <= 100,
      s"token counts outside the driver table's 8..100 band: $tokCounts")
    val langs = d.select("lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "zh", "es", "fr", "de")))
    // en is weighted 40% — must dominate
    val byLang = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en") > byLang.filter(_._1 != "en").values.max)
    assert(d.select("source").distinct().count() === 20)
    // n_chars is derived from text, as in the driver table
    assert(d.filter(length(col("text")) =!= col("n_chars")).count() === 0)
  }

  test("vocabulary grows ~sqrt(n): scale-invariant random-collision density") {
    assert(ScaleProbe.vocabSize(ScaleProbe.BaseDocs) === 30)
    assert(ScaleProbe.vocabSize(ScaleProbe.BaseDocs * 100) === 300)
    val v10 = ScaleProbe.vocabSize(ScaleProbe.BaseDocs * 10)
    assert(v10 > 30 && v10 < 300)
    // the generator actually uses that many distinct tokens
    val d = ScaleProbe.synthDocuments(spark, 1000)
    val distinctToks = d.select(explode(split(col("text"), " ")).as("w"))
      .distinct().count()
    assert(distinctToks === ScaleProbe.vocabSize(1000),
      s"generator vocab $distinctToks != declared ${ScaleProbe.vocabSize(1000)}")
  }

  test("synthEmbeddings: 64-dim, 10 labels, label-center geometry separates clusters") {
    val e = ScaleProbe.synthEmbeddings(spark, 500).cache()
    assert(e.columns.toSeq === Seq("vec_id", "embedding", "label"))
    assert(e.filter(size(col("embedding")) =!= ScaleProbe.EmbDim).count() === 0)
    val labels = e.select("label").distinct().as[Int].collect().toSet
    assert(labels === (0 until 10).toSet)
    // same-label vectors sit nearer their own label mean than other labels'
    // means on average (centers + bounded noise) — spot-check dimension 0:
    // the per-label mean of dim 0 must vary across labels (real centers)
    val m0 = e.select(col("label"), element_at(col("embedding"), 1).as("v"))
      .groupBy("label").agg(avg("v").as("m")).as[(Int, Double)].collect().toMap
    assert(m0.values.max - m0.values.min > 0.3,
      s"label centers look collapsed on dim 0: $m0")
  }

  test("synthParts: 5-word Heaps-vocab names with fixed exact-twin density") {
    val p = ScaleProbe.synthParts(spark, 500).cache()
    assert(p.columns.toSeq === Seq("p_partkey", "p_name"))
    assert(p.count() === 500)
    // every name is exactly 5 words (both blocking bigrams always valid)
    assert(p.filter(size(split(col("p_name"), " ")) =!= 5).count() === 0)
    // planted twins: id%5==4 copies id-4's name → exactly n/5 duplicated
    // rows, so distinct names = n - n/5
    assert(p.select("p_name").distinct().count() === 400)
    val twin = p.filter(col("p_partkey") % 5 === 4)
      .select(col("p_partkey").as("k2"), col("p_name").as("n2"))
    val joined = p.join(twin, col("p_partkey") === col("k2") - 4)
    assert(joined.filter(col("p_name") =!= col("n2")).count() === 0,
      "id%5==4 must carry an exact copy of id-4's name")
    // name vocabulary follows the same Heaps law as documents
    val words = p.select(explode(split(col("p_name"), " ")).as("w")).distinct().count()
    assert(words === ScaleProbe.vocabSize(500),
      s"part-name vocab $words != declared ${ScaleProbe.vocabSize(500)}")
  }

  test("planted-dup density is scale-invariant through Dedup.corpus") {
    // the probe relies on Dedup.corpus planting dups at fixed doc_id-modulo
    // density: corpus(n docs) = n + n/10 near + n/20 exact rows
    val d1 = graft.operators.Dedup.corpus(ScaleProbe.synthDocuments(spark, 200))
    val d2 = graft.operators.Dedup.corpus(ScaleProbe.synthDocuments(spark, 2000))
    assert(d1.count() === 200 + 20 + 10)
    assert(d2.count() === 2000 + 200 + 100)
  }
}
