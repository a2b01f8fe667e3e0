package graft.tools

import graft.{Engine, SparkEntry}

/** Dev tool: print the formatted physical plan of one or all queries.
  * Usage: graft.tools.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session("graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val targets = name.map(n => Seq(n -> SparkEntry.queries(n)))
      .getOrElse(SparkEntry.queries.toSeq.sortBy(_._1))
    targets.foreach { case (n, fn) =>
      println(s"\n========== $n ==========")
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
