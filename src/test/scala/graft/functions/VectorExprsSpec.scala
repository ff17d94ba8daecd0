package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{VecDot, VectorFunctions}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.SparkSpec

/** Pins [[VecDot]]'s contract across BOTH execution paths after the r21
  * optimization replaced `toDoubleArray()` (one 512-byte copy per side per
  * call — pure GC churn in the O(n²) cosine joins) with direct ArrayData
  * element reads: the DataFrame path exercises the generated code, the raw
  * `eval` call exercises the interpreted `nullSafeEval`. Accumulation order is
  * index-ascending in both, so results must equal a plain while-loop
  * bit-for-bit.
  */
class VectorExprsSpec extends SparkSpec {

  private def refDot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private val va = Array.tabulate(64)(i => math.sin(i + 1.0) * 3.25)
  private val vb = Array.tabulate(64)(i => math.cos(i * 0.7) - 0.125)

  test("vecDot codegen path matches the plain-loop reference bit-for-bit") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types
      .StructType(
        Seq(
          org.apache.spark.sql.types.StructField("a", ArrayType(DoubleType)),
          org.apache.spark.sql.types.StructField("b", ArrayType(DoubleType)),
        ),
      )
    val df = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(va.toSeq, vb.toSeq)).asJava,
      schema,
    )
    val got = df.select(VectorFunctions.vecDot(col("a"), col("b"))).head().getDouble(0)
    assert(got == refDot(va, vb))
    val nrm = df.select(VectorFunctions.vecNorm(col("a"))).head().getDouble(0)
    assert(nrm == math.sqrt(refDot(va, va)))
  }

  test("vecDot interpreted eval: min-length, empty, and null semantics") {
    def lit(xs: Seq[Double]) = Literal.create(xs, ArrayType(DoubleType))
    // interpreted nullSafeEval path (no codegen)
    val full = VecDot(lit(va.toSeq), lit(vb.toSeq)).eval(null)
    assert(full == refDot(va, vb))
    // different lengths → min-length prefix
    val short = VecDot(lit(Seq(2.0, 4.0)), lit(Seq(3.0, 5.0, 7.0))).eval(null)
    assert(short == (2.0 * 3.0 + 4.0 * 5.0))
    // empty side → 0.0
    assert(VecDot(lit(Seq.empty), lit(Seq(1.0))).eval(null) == 0.0)
    // null side → null
    val nul = VecDot(Literal.create(null, ArrayType(DoubleType)), lit(Seq(1.0))).eval(null)
    assert(nul == null)
  }
}
