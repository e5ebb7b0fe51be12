/*
 * Graft Catalyst extension (SURVEY.md §4.2 item 4, the optional stretch):
 *
 *   - `cosine_sim(a, b)` — an exact cosine-similarity expression over two
 *     numeric arrays, registered as a native SQL function. The body is
 *     RuntimeReplaceable arithmetic unrolled to a fixed dimensionality
 *     (`spark.graft.ann.dim`, default 64 = the fixture corpus), so it
 *     lowers to plain Multiply/Add/Sqrt/Divide inside whole-stage codegen —
 *     no UDF boundary, no lambda allocation per row.
 *
 *   - `AnnSignBucketRewrite` — an opt-in logical rewrite
 *     (`spark.graft.ann.rewrite.enabled`, default false) that recognizes the
 *     brute-force ANN idiom
 *
 *         ORDER BY cosine_sim(col, <foldable query vector>) DESC LIMIT k
 *
 *     and injects the random-hyperplane sign-bucket prefilter below the sort:
 *     row survives iff sign(col[i]) == sign(q[i]) for the first
 *     `spark.graft.ann.rewrite.bits` dimensions (default 4 → 1/16 of a
 *     sign-symmetric corpus scanned/sorted). This is the engine-enforced
 *     twin of the API-layer plan in `plans/queries_llm.llm_simsearch_lsh`
 *     (same bucket function: axis-aligned hyperplanes over the leading
 *     dims) — the rewrite trades recall for cost exactly like every LSH
 *     prefilter, which is why it is OFF unless the session opts in.
 *
 * The rule is injected at post-hoc resolution: the analyzed plan still
 * carries the CosineSim node there (RuntimeReplaceable bodies are expanded
 * by the optimizer's ReplaceExpressions, which runs later), so the match is
 * a named-node lookup, not a fragile arithmetic-tree pattern.
 *
 * Derived from public Spark APIs only (SparkSessionExtensions,
 * catalyst.expressions, catalyst.plans.logical). Reference parity: the
 * reference system has no optimizer at all (615-LoC Go CQRS demo); this
 * file exists for SURVEY §4.2's stretch goal.
 */
package graft.spark

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact cosine over two numeric arrays, unrolled to `dim` dimensions of
 *  resolved scalar arithmetic (stays in whole-stage codegen; NULL if either
 *  array is NULL or shorter than `dim` under non-ANSI element_at). */
case class CosineSim(a: Expression, b: Expression, dim: Int)
    extends Expression with RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(a, b)

  private def elem(e: Expression, i: Int): Expression =
    Cast(ElementAt(e, Literal(i)), DoubleType)

  private def dot(x: Expression, y: Expression): Expression =
    (1 to dim).map(i => Multiply(elem(x, i), elem(y, i)): Expression)
      .reduce(Add(_, _))

  override lazy val replacement: Expression =
    Divide(dot(a, b), Multiply(Sqrt(dot(a, a)), Sqrt(dot(b, b))))

  override def prettyName: String = "cosine_sim"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(a = newChildren(0), b = newChildren(1))
}

/** Jaro-Winkler similarity, the exact algorithm of the Arrow-batched
 *  pandas UDF in `plans/queries_ext12.jaro_winkler_udf` (itself proven
 *  bit-equal to DuckDB's `jaro_winkler_similarity` by the hypothesis law
 *  in tests/test_ext12_semantics.py): half-max-length match window,
 *  transpositions halved, 0.1/char Winkler prefix boost above 0.7 with
 *  the prefix capped at 4. Iterates CODE POINTS (not UTF-16 units), so
 *  supplementary-plane strings score identically to the Python
 *  reference. The same IEEE association — (m/l1 + m/l2 + (m-t)/m)/3,
 *  then s + (pl*0.1)*(1-s) — keeps the result bit-equal. */
object JaroWinklerImpl {
  def similarity(sa: String, sb: String): Double = {
    val a = sa.codePoints.toArray
    val b = sb.codePoints.toArray
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0    // empty check precedes equal
    if (java.util.Arrays.equals(a, b)) return 1.0
    val win = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - win)
      val hi = math.min(l2, i + win + 1)
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && b(j) == a(i)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (a(i) != b(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    val s = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (s > 0.7) {
      var pl = 0
      val lim = math.min(4, math.min(l1, l2))
      var k = 0
      while (k < lim && a(k) == b(k)) { pl += 1; k += 1 }
      s + pl * 0.1 * (1.0 - s)
    } else s
  }
}

/** `jaro_winkler_sim(a, b)` as a native binary expression: nullSafeEval
 *  plus a one-call doGenCode (the `levenshtein` builtin's pattern), so
 *  the ER scoring loop stays inside whole-stage codegen with no Python
 *  worker in the path. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler_sim expects (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerImpl.similarity(l.asInstanceOf[UTF8String].toString,
                               r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.spark.JaroWinklerImpl.similarity($a.toString(), $b.toString())")

  override def prettyName: String = "jaro_winkler_sim"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Opt-in rewrite: ORDER BY cosine_sim(col, lit) DESC LIMIT k  →  the same
 *  plan with Filter(sign(col[i]) == sign(lit[i]), i ≤ bits) pushed below
 *  the Sort, next to the scan. */
class AnnSignBucketRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    session.conf.get("spark.graft.ann.rewrite.enabled", "false").toBoolean

  private def bits: Int =
    session.conf.get("spark.graft.ann.rewrite.bits", "4").toInt

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_, s: Sort)) if s.global =>
        rewriteSort(s) match {
          case Some(ns) => gl.copy(child = ll.copy(child = ns))
          case None     => gl
        }
    }
  }

  /** The query-side bucket is computed at rewrite time from the foldable
   *  vector; the column side becomes bits-many sign tests. Returns None
   *  (no rewrite) on anything unexpected — the rewrite must never turn a
   *  valid plan into an invalid one. */
  private def bucketPred(col: Expression, qvec: Expression): Option[Expression] = {
    if (!qvec.foldable) return None
    val elementType = qvec.dataType match {
      case ArrayType(et, _) => et
      case _                => return None
    }
    val data = qvec.eval() match {
      case ad: ArrayData => ad
      case _             => return None
    }
    if (data.numElements() < bits || bits < 1) return None
    val conjuncts: Seq[Option[Expression]] = (0 until bits).map { i =>
      val q: Option[Double] = elementType match {
        case FloatType   => Some(data.getFloat(i).toDouble)
        case DoubleType  => Some(data.getDouble(i))
        case IntegerType => Some(data.getInt(i).toDouble)
        case LongType    => Some(data.getLong(i).toDouble)
        case _           => None
      }
      q.map { x =>
        val e = Cast(ElementAt(col, Literal(i + 1)), DoubleType)
        if (x >= 0) GreaterThanOrEqual(e, Literal(0.0d)): Expression
        else LessThan(e, Literal(0.0d)): Expression
      }
    }
    if (conjuncts.exists(_.isEmpty)) None
    else Some(conjuncts.flatten.reduce(And(_, _)))
  }

  private def findCos(e: Expression): Option[CosineSim] =
    e.collectFirst {
      case cs: CosineSim if cs.b.foldable && !cs.a.foldable => cs
    }

  /** Skip if the insertion point already carries this exact predicate
   *  (re-analysis of a reused DataFrame subtree must be a no-op). */
  private def alreadyFiltered(child: LogicalPlan, pred: Expression): Boolean =
    child match {
      case f: Filter => f.condition.semanticEquals(pred)
      case _         => false
    }

  private def rewriteSort(s: Sort): Option[Sort] = {
    // the cosine must be the PRIMARY sort key; trailing keys (the
    // deterministic `, vec_id` tiebreak idiom) are fine
    if (s.order.isEmpty) return None
    val so = s.order.head
    if (so.direction != Descending) return None
    s.child match {
      // SQL `ORDER BY cos DESC` resolves the sort key through the Project
      // that carries Alias(CosineSim, "cos"): chase the alias, filter below
      // the Project where the embedding column is still in scope.
      case p: Project =>
        val aliasMap = p.projectList.collect {
          case al: Alias => al.toAttribute.exprId -> al.child
        }.toMap
        val resolvedKey = so.child.transformUp {
          case ar: AttributeReference if aliasMap.contains(ar.exprId) =>
            aliasMap(ar.exprId)
        }
        for {
          cs   <- findCos(resolvedKey)
          if cs.a.references.subsetOf(p.child.outputSet)
          pred <- bucketPred(cs.a, cs.b)
          if !alreadyFiltered(p.child, pred)
        } yield s.copy(child = p.copy(child = Filter(pred, p.child)))
      // DataFrame `orderBy(cosine_sim(...).desc)` keeps the call in the
      // sort order itself: filter directly below the sort.
      case other =>
        for {
          cs   <- findCos(so.child)
          if cs.a.references.subsetOf(other.outputSet)
          pred <- bucketPred(cs.a, cs.b)
          if !alreadyFiltered(other, pred)
        } yield s.copy(child = Filter(pred, other))
    }
  }
}

/** Entry point for spark.sql.extensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        val dim =
          try SQLConf.get.getConfString("spark.graft.ann.dim", "64").toInt
          catch { case _: Exception => 64 }
        CosineSim(args(0), args(1), dim)
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler_sim"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler_sim"),
      (args: Seq[Expression]) => JaroWinklerSim(args(0), args(1))))
    ext.injectPostHocResolutionRule(session => new AnnSignBucketRewrite(session))
  }
}
