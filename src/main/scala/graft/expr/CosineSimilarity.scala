package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native fused cosine-similarity kernel over two `array<float>` columns.
  *
  * The composable formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`,
  * [[graft.operators.Similarity.dot]]) materializes an intermediate
  * products array per row and walks each vector three times (dot + both
  * norms as separate expression trees). For ANN workloads the kernel IS
  * the inner loop — at 100 TB the difference between one fused pass and
  * three passes with allocation is the job cost. This expression
  * computes dot and both norms in ONE loop with zero allocation, in both
  * interpreted and whole-stage-codegen paths.
  *
  * Semantics are BIT-IDENTICAL to the composable form (same
  * left-to-right double accumulation, same final `dot/(√na·√nb)`), so the
  * DuckDB oracle match is unaffected; mismatched vector lengths yield
  * NULL exactly like `zip_with`'s null padding does, and a zero-norm
  * vector behaves exactly like Spark's `Divide` on a zero divisor IN THE
  * SESSION'S MODE — ANSI (the 4.x default) throws Spark's own
  * DIVIDE_BY_ZERO `SparkArithmeticException` (via the
  * [[org.apache.spark.sql.graft.GraftErrors]] bridge), legacy yields
  * NULL. The mode is a CONSTRUCTOR parameter defaulted from the conf at
  * creation time — exactly how `Divide` carries its `evalMode` — so
  * Catalyst `copy()`/`withNewChildrenInternal` transformations preserve
  * the captured mode instead of re-reading a possibly-changed conf, and
  * two instances with different modes are not `equals`. All pinned by
  * test, and all required for [[RewriteComposedCosine]] to be a sound
  * rewrite.
  */
case class CosineSimilarity(left: Expression, right: Expression,
    ansiEnabled: Boolean = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        // double vectors take the same fused loop without the widening
        // cast — bit-identical to the composed double form, which is
        // what cluster-assignment frames (k-means output) carry
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity requires (array<float>, array<float>) or " +
          s"(array<double>, array<double>), got (${l.sql}, ${r.sql})")
    }

  private def isDoubleElem: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val dbl = isDoubleElem
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (dbl) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (dbl) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) {
      if (ansiEnabled)
        throw org.apache.spark.sql.graft.GraftErrors.divideByZeroError(null)
      null
    } else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = ${if (isDoubleElem) s"$a.getDouble($i)"
              else s"(double) $a.getFloat($i)"};
         |    final double $yi = ${if (isDoubleElem) s"$b.getDouble($i)"
              else s"(double) $b.getFloat($i)"};
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($denom == 0.0) {
         |    ${if (ansiEnabled)
              "throw org.apache.spark.sql.graft.GraftErrors.divideByZeroError(null);"
            else s"${ev.isNull} = true;"}
         |  } else {
         |    ${ev.value} = $dot / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native SQL functions — via
  * [[GraftExtensions]] for sessions built with
  * `.withExtensions(new GraftExtensions)` / the
  * `spark.sql.extensions` conf, or [[NativeFunctions.register]] for an
  * existing session (the driver owns the harness sessions). */
object NativeFunctions {
  val cosineInfo = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "cosine_similarity(a, b) takes 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  /** `might_contain(bloom_binary, xxhash64_value)` — Spark ships the
    * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * predicate (the probe half of its runtime row-level filtering) but
    * does not expose it in the SQL registry; graft registers it so
    * [[graft.operators.BloomJoin]] can prune probe sides with a
    * distributed-built filter. */
  val mightContainInfo = (
    FunctionIdentifier("might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "might_contain"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "might_contain(bloom, value) takes 2 arguments")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children.head, children(1))
    })

  /** `bloom_filter_agg(xxhash64_value, estimatedItems, numBits)` — the
    * build half of Spark's runtime row-level filtering
    * ([[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]]);
    * like might_contain it is internal-registry-only upstream, so graft
    * registers it for [[graft.operators.BloomJoin]]'s distributed build. */
  val bloomAggInfo = (
    FunctionIdentifier("bloom_filter_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "bloom_filter_agg"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "bloom_filter_agg(value, estimatedItems, numBits) takes 3 arguments")
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        children.head, children(1), children(2))
        .toAggregateExpression()
    })

  def register(spark: SparkSession): Unit = {
    Seq(cosineInfo, mightContainInfo, bloomAggInfo).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}

/** Session-extensions hook: `SparkSession.builder.withExtensions(new
  * GraftExtensions)` or `--conf spark.sql.extensions=graft.expr.GraftExtensions`.
  * Injects the native function/optimizer/strategy ladder AND the SQL
  * surface for snapshot tables (time travel + DML lowering,
  * [[graft.sql.GraftSqlSupport]]) — build-time only; resolution rules
  * have no post-build path, which is why Verify/Bench/local builders
  * all pass this class to `withExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(NativeFunctions.cosineInfo)
    ext.injectFunction(NativeFunctions.mightContainInfo)
    ext.injectFunction(NativeFunctions.bloomAggInfo)
    ext.injectOptimizerRule(_ => RewriteComposedCosine)
    ext.injectPlannerStrategy(_ => graft.plans.SessionizeStrategy)
    // hint batch (runs BEFORE Resolution): RelationTimeTravel must be
    // intercepted before the built-in ResolveRelations, whose v1-table
    // time-travel path throws rather than leaving the node unresolved
    ext.injectHintResolutionRule(s => new graft.sql.GraftTimeTravelRule(s))
    ext.injectResolutionRule(s => new graft.sql.GraftDmlRule(s))
    // the ALTER verbs stock Spark parses AND executes on v1 tables
    // (SET/UNSET TBLPROPERTIES, ADD COLUMN(S)) are intercepted POST-HOC,
    // after Spark's own resolution lowered them to its v1 commands, and
    // only for provider=graft targets — non-graft tables keep stock
    // behavior (the round-13 parser interception broke them)
    ext.injectPostHocResolutionRule(s => new graft.sql.GraftCatalogDdlRule(s))
    // maintenance verbs (VACUUM / OPTIMIZE / RESTORE / DESCRIBE HISTORY
    // / branch-tag DDL) have no stock grammar — a delegating parser
    // recognizes them first and hands every other statement through
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
  }
}
