package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity over two `ArrayType(FloatType)` columns as a native
  * codegen'd Catalyst expression: accumulates dot product and norms in
  * double over a single fused loop — stays inside WholeStageCodegen, no
  * UDF serialization, no per-row allocation. This is the 100-TB-friendly
  * form SURVEY.md §7.3 calls for (Q26); the higher-order-function
  * composition (`aggregate` + `zip_with`) would allocate a zipped array
  * per row.
  *
  * Returns null when either side is null or a norm is zero.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // no ExpectsInputTypes: AbstractDataType is private[sql] in Spark 4.
  // Callers must pass ArrayType(FloatType) columns (all graft call sites do).
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) null else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |final int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double xv = (double) $x.getFloat($i);
         |  final double yv = (double) $y.getFloat($i);
         |  $dot += xv * yv; $nx += xv * xv; $ny += yv * yv;
         |}
         |if ($nx == 0.0 || $ny == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product over two float-array columns (double accumulation), same
  * codegen shape as [[CosineSimilarity]]; useful with pre-normalized
  * embeddings where cosine == dot.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket id over an `ArrayType(FloatType)` column:
  * bit p of the result is the sign of dot(embedding, plane_p). As a
  * Column-expression tree this is nPlanes×dim arithmetic nodes (384 for
  * 6×64) — beyond codegen method limits, so it fell back to interpreted
  * per-node evaluation (the "known non-ideal spot" in PLANS.md). As a
  * native expression it is one fused loop inside WholeStageCodegen, and
  * the plane matrix rides along as a referenced constant instead of 384
  * literals. Accumulation order matches the old fold exactly (sequential
  * adds per plane), so bucket ids are bit-identical on non-null input.
  *
  * Null contract: a NULL embedding yields a NULL bucket (standard unary
  * null propagation — the row drops out of any bucket equi-join, which is
  * the sane ANN behavior for an unembeddable item); array ELEMENTS are
  * assumed non-null, matching the embeddings table contract.
  */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(a: Any): Any =
    HyperplaneBucket.bucketOf(a.asInstanceOf[ArrayData].toFloatArray(), planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val bkt = ctx.freshName("bkt")
      val p = ctx.freshName("p")
      val pl = ctx.freshName("pl")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |long $bkt = 0L;
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  final double[] $pl = $planesRef[$p];
         |  final int $n = Math.min($x.numElements(), $pl.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $x.getFloat($i) * $pl[$i];
         |  }
         |  if ($dot >= 0.0) $bkt |= (1L << $p);
         |}
         |${ev.value} = $bkt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Bucket id of a float vector under `planes` — the single source of
    * truth for the sign rule (`dot >= 0`), the accumulation order
    * (sequential adds in index order), and the min-length truncation.
    * The expression's interpreted eval calls this directly; driver-side
    * index probes ([[graft.operators.Similarity.probeLshIndex]]) MUST use
    * it too, so the probe bucket cannot drift from the stored buckets.
    * The codegen template above mirrors this loop line-for-line
    * (Round3Spec asserts eval ≡ codegen ≡ probe).
    */
  def bucketOf(vec: Array[Float], planes: Array[Array[Double]]): Long = {
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val n = math.min(vec.length, pl.length)
      var dot = 0.0; var i = 0
      while (i < n) { dot += vec(i).toDouble * pl(i); i += 1 }
      if (dot >= 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

/** y = M·x: dense projection of a float-vector column by a constant
  * double matrix (rows = output dims), as ONE fused codegen'd loop nest
  * with the matrix riding along as a referenced constant — same rationale
  * as [[HyperplaneBucket]]: the Column-tree form is rows×dim arithmetic
  * nodes (1024 for 16×64), past codegen method limits. Accumulation is
  * sequential in index order per output row, so results are
  * bit-reproducible. NULL vector → NULL projection; elements assumed
  * non-null (embeddings table contract).
  */
case class MatrixProject(child: Expression, matrix: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "matrix_project"

  override def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      MatrixProject.projectOf(a.asInstanceOf[ArrayData].toFloatArray(), matrix))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val mRef = ctx.addReferenceObj("matrix", matrix, "double[][]")
      val res = ctx.freshName("res")
      val j = ctx.freshName("j")
      val row = ctx.freshName("row")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |double[] $res = new double[$mRef.length];
         |for (int $j = 0; $j < $mRef.length; $j++) {
         |  final double[] $row = $mRef[$j];
         |  final int $n = Math.min($x.numElements(), $row.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $x.getFloat($i) * $row[$i];
         |  }
         |  $res[$j] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatrixProject {
  /** Single source of truth for the projection loop (interpreted eval;
    * the codegen template mirrors it line-for-line).
    */
  def projectOf(vec: Array[Float], matrix: Array[Array[Double]]): Array[Double] = {
    val res = new Array[Double](matrix.length)
    var j = 0
    while (j < matrix.length) {
      val row = matrix(j)
      val n = math.min(vec.length, row.length)
      var acc = 0.0; var i = 0
      while (i < n) { acc += vec(i).toDouble * row(i); i += 1 }
      res(j) = acc
      j += 1
    }
    res
  }
}

object VectorFunctions {
  /** Register the vector expressions in the session's function registry so
    * they are callable from both the Column API (via [[cosineSim]]) and
    * SQL text. Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
  }

  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)
}
