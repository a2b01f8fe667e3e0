package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{HashedTf, NfcNormalize, PolyHash, PyFloat, RandomHyperplaneBits, SeqDot, SignProject}

/** SparkSessionExtensions entry point for the graft engine — the
  * deployment-grade registration path for our native expressions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Inside an already-running session (tests, Verify), the equivalent is
  * each expression object's `register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)
    ))
    e.injectFunction((
      FunctionIdentifier("py_float"),
      new ExpressionInfo(classOf[PyFloat].getName, "py_float"),
      (exprs: Seq[Expression]) => PyFloat(exprs.head)
    ))
    e.injectFunction((
      FunctionIdentifier("hyperplane_bits"),
      new ExpressionInfo(classOf[RandomHyperplaneBits].getName, "hyperplane_bits"),
      (exprs: Seq[Expression]) =>
        RandomHyperplaneBits(exprs.head, graft.operators.Similarity.NumPlanes)
    ))
    e.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)
    ))
    e.injectFunction((
      FunctionIdentifier("hashed_tf"),
      new ExpressionInfo(classOf[HashedTf].getName, "hashed_tf"),
      (exprs: Seq[Expression]) => HashedTf(exprs.head,
        graft.operators.Classifier.NumBuckets,
        graft.operators.Classifier.FeatScale)
    ))
    e.injectFunction((
      FunctionIdentifier("sign_project"),
      new ExpressionInfo(classOf[SignProject].getName, "sign_project"),
      (exprs: Seq[Expression]) =>
        SignProject(exprs.head, graft.operators.Similarity.JlDims)
    ))
    e.injectFunction((
      FunctionIdentifier("seq_dot"),
      new ExpressionInfo(classOf[SeqDot].getName, "seq_dot"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => SeqDot(a, b)
        case _ => throw new IllegalArgumentException(
          s"seq_dot requires exactly 2 arguments, got ${exprs.size}")
      }
    ))
  }
}
