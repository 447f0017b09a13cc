package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression computing ALL sign-LSH table buckets of an
  * embedding in one codegen'd pass: for each of `nTables` hash tables,
  * the bucket id is the bit-pack of `sign(vec . plane(t,b))` over the
  * table's `bitsPerTable` deterministic md5-parity hyperplanes
  * ([[SimilarityOps.signPlanes]]).
  *
  * Exists because the composed form — `transform`/`aggregate`/`zip_with`
  * higher-order functions over a literal plane matrix — evaluates
  * interpreted with a per-plane array allocation: at the q44 defaults
  * (32 tables x 10 bits) that is 320 allocations per row on what should
  * be a tight 20k-multiply loop. This expression holds the flattened
  * plane weights in ONE referenced double[] and emits plain nested Java
  * loops — no allocation beyond the output array, fully inside
  * whole-stage codegen. Arithmetic is bit-identical to the composed form
  * (ascending-dimension double sums), so bucket ids — and therefore the
  * q46 DuckDB oracle — are unchanged.
  */
case class SignLshBuckets(child: Expression, nTables: Int, bitsPerTable: Int)
    extends UnaryExpression {

  private val dims = 64

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_buckets requires array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_buckets"

  // flattened (table, bit, dim) -> weight; built once on the driver and
  // shipped as a single primitive array reference
  @transient private lazy val weights: Array[Double] =
    SimilarityOps.signPlanes(nTables, bitsPerTable, dims)
      .flatten.map(_.toArray).toArray.flatten

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(dims, arr.numElements())
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < bitsPerTable) {
        val base = (t * bitsPerTable + b) * dims
        var dot = 0.0
        var i = 0
        while (i < n) { dot += arr.getDouble(i) * weights(base + i); i += 1 }
        if (dot > 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("lshWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      // EVERY local must go through freshName: two instances of this
      // expression can land in one generated method (e.g. the query and
      // corpus bucketings of an LSH self-join after codegen collapsing),
      // and janino rejects redefined locals — the whole stage would fall
      // back to interpreted execution (observed on the sf1 multi-file
      // plans before this was fresh-named)
      val buckets = ctx.freshName("buckets")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val base = ctx.freshName("base")
      val bucket = ctx.freshName("bucket")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |long[] $buckets = new long[$nTables];
         |int $n = java.lang.Math.min($dims, $c.numElements());
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $bitsPerTable; $b++) {
         |    int $base = ($t * $bitsPerTable + $b) * $dims;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += $c.getDouble($i) * $w[$base + $i];
         |    }
         |    if ($dot > 0) $bucket |= 1L << $b;
         |  }
         |  $buckets[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}

object SignLsh {
  /** Register `sign_lsh_buckets(vec, nTables, bitsPerTable)` on a session
    * (idempotent; the table-shape arguments must be literals).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // guarded: per-query callers must not WARN-spam "replaced a
    // previously registered function" on every invocation
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("sign_lsh_buckets")))
      reg.createOrReplaceTempFunction(
        "sign_lsh_buckets", exprs => SignLshBuckets(exprs(0),
          exprs(1).eval().asInstanceOf[Int],
          exprs(2).eval().asInstanceOf[Int]), "scala_udf")
  }

  /** Column API (registers on the fly). */
  def buckets(spark: SparkSession, c: Column,
      nTables: Int, bitsPerTable: Int): Column = {
    register(spark)
    call_function("sign_lsh_buckets", c, lit(nTables), lit(bitsPerTable))
  }
}
