package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{PrefixRowsAgg, RankRowsAgg, TopKRowsAgg}

/** Automatic `row_number() OVER (...) <= k` → bounded-heap rewrite.
  *
  * The window-rank-then-filter idiom is the standard SQL top-k-per-
  * group, and it is also the classic large-scale anti-pattern: the
  * Window operator shuffles EVERY row of every group to that group's
  * reducer and full-sorts it, only for the filter to discard all but
  * k. (Spark's own InferWindowGroupLimit bounds the per-task input
  * with a sort-based group limit, but the full-group sort at the
  * reducer remains.) This rule replaces the whole pattern with a
  * [[graft.functions.TopKRowsAgg]] aggregation — O(k) heap state per
  * group, map-side partial aggregation, ≤ k rows per (partition,
  * group) crossing the shuffle, no sort anywhere — then restores the
  * original schema (payload columns + the rank, with their original
  * exprIds) via posexplode, so parent operators are untouched.
  *
  * `rank()` and `dense_rank()` rewrite too, via
  * [[graft.functions.RankRowsAgg]] — a tie-expanded KEY-GROUP heap
  * (rank-like filters may legitimately emit more than k rows under
  * boundary ties, so eviction is by key group; state is
  * O(k + boundary ties), the semantics' own lower bound). The tie
  * term is input-dependent, and unlike the Window plan an aggregation
  * buffer cannot spill — the heap fails LOUD (never wrong) past
  * `spark.graft.rankLimitRewrite.maxTieRows` retained rows per group,
  * with guidance to raise the cap or disable the rewrite.
  *
  * Safety:
  *  - Only `row_number`/`rank`/`dense_rank` are rewritten; other
  *    window functions keep their Window plan.
  *  - Only conjuncts of the shapes rn<=k / rn<k / rn=1 (and mirror
  *    forms) trigger; any other predicate on the rank column (rn>=2,
  *    rn<=expr, ...) disables the rewrite for that filter. Residual
  *    conjuncts on other columns are preserved above the rewrite.
  *  - `k` is capped (`spark.graft.rankLimitRewrite.maxK`, default
  *    1000): heap state is O(k) per group for row_number (O(k +
  *    boundary ties) for rank-like, fail-loud-capped per the
  *    paragraph above), and beyond that a sort is the right plan
  *    anyway.
  *  - The window's partition/order expressions must be deterministic.
  *  - Under a non-total sort order, row_number is already
  *    nondeterministic; the heap picks one valid outcome, as the
  *    sort-based plan's pick already depends on partitioning.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule` → the operator-optimization fixed point, so
  * it also catches the Filter once PushPredicateThroughNonJoin moves
  * it adjacent to the Window). Disable with
  * `spark.graft.rankLimitRewrite=false`.
  */
object RewriteRankLimit extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rankLimitRewrite", "true").toBoolean
  private def maxK: Int =
    conf.getConfString("spark.graft.rankLimitRewrite.maxK", "1000").toInt
  private def maxTieRows: Int =
    conf.getConfString("spark.graft.rankLimitRewrite.maxTieRows",
      graft.functions.RankRowsAgg.DefaultMaxRows.toString).toInt

  /** conjunct → Some(k) if it bounds `rn` to a top-k prefix. */
  private def limitOf(e: Expression, rn: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case f @ Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(fn,
            WindowSpecDefinition(part, order, _)), _)), _, _, wchild, _))
          if order.nonEmpty && rankKind(fn).isDefined &&
            (part ++ order.map(_.child)).forall(_.deterministic) =>
        val rn = alias.toAttribute
        val conjuncts = splitConjunctivePredicates(cond)
        val (rnConjs, rest) = conjuncts.partition(_.references.contains(rn))
        val ks = rnConjs.map(limitOf(_, rn))
        if (rnConjs.isEmpty || ks.contains(None)) f
        else {
          val k = ks.flatten.min
          if (k < 1 || k > maxK) f
          else {
            // InferWindowGroupLimit (if it ran first) inserts a
            // sort-based group limit under the Window — subsumed by
            // the heap, so strip it
            val child = wchild match {
              case WindowGroupLimit(_, _, _, _, c) => c
              case c => c
            }
            rankKind(fn).get match {
              case RowNumKind => rewrite(child, part, order, k, rn, rest)
              case RankKind => rewriteRankLike(child, part, order, k, rn, rest, dense = false)
              case DenseKind => rewriteRankLike(child, part, order, k, rn, rest, dense = true)
            }
          }
        }

      // percent_rank() <= p / ntile(t) <= q prefixes: the cutoff is a
      // FRACTION of the group, so the bound depends on the group's
      // total count — no single-pass heap can evict safely (a future
      // merge only ever raises the threshold). Sound two-aggregation
      // shape: per-group count(1) joined back, then a variable-k heap
      // (PrefixRowsAgg) reading its per-group bound from the joined
      // column; the original predicate is RE-APPLIED on the exactly
      // reconstructed window value, so the heap bound only needs to
      // over-approximate.
      case f @ Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(fn,
            WindowSpecDefinition(part, order, _)), _)), _, _, wchild, _))
          if order.nonEmpty && prefixKind(fn).isDefined &&
            (part ++ order.map(_.child)).forall(_.deterministic) =>
        val wattr = alias.toAttribute
        val conjuncts = splitConjunctivePredicates(cond)
        val (wConjs, rest) = conjuncts.partition(_.references.contains(wattr))
        if (wConjs.isEmpty) f
        else prefixKind(fn).get match {
          case PctKind =>
            val ps = wConjs.map(pctBound(_, wattr))
            if (ps.contains(None)) f
            else {
              val p = ps.flatten.min
              if (p <= 0.0 || p >= 1.0) f // empty / whole-group: not a prefix
              else rewritePrefix(wchild, part, order, wattr, wConjs, rest,
                rankSem = true,
                kOf = n => Add(Cast(Floor(Multiply(Literal(p),
                  Cast(Subtract(n, Literal(1L)), DoubleType))), LongType), Literal(2L)),
                valueOf = (rnk, _, n) =>
                  // mirror Spark's PercentRank.evaluateExpression
                  If(GreaterThan(n, Literal(1L)),
                    Divide(Cast(Subtract(rnk, Literal(1L)), DoubleType),
                      Cast(Subtract(n, Literal(1L)), DoubleType)),
                    Literal(0.0d)))
            }
          case CumeKind =>
            val ps = wConjs.map(pctBound(_, wattr))
            if (ps.contains(None)) f
            else {
              val p = ps.flatten.min
              if (p <= 0.0 || p >= 1.0) f
              else rewritePrefix(wchild, part, order, wattr, wConjs, rest,
                rankSem = true,
                // cume_dist <= p keeps rows whose tie-group END ≤ p·n
                kOf = n => Add(Cast(Floor(Multiply(Literal(p),
                  Cast(n, DoubleType))), LongType), Literal(2L)),
                valueOf = (_, pend, n) =>
                  // mirror Spark's CumeDist.evaluateExpression:
                  // rows ≤ current (through the tie group) over n
                  Divide(Cast(pend, DoubleType), Cast(n, DoubleType)))
            }
          case NtileKind(t) =>
            val qs = wConjs.map(ntileBound(_, wattr))
            if (qs.contains(None)) f
            else {
              val q = qs.flatten.min
              if (q < 1 || q >= t) f
              else {
                val tL = Literal(t.toLong); val qL = Literal(q.toLong)
                rewritePrefix(wchild, part, order, wattr, wConjs, rest,
                  rankSem = false,
                  // first (n % t) buckets hold (n div t)+1 rows:
                  // rows in buckets 1..q = q*(n div t) + min(q, n % t)
                  kOf = n => Add(Multiply(qL, IntegralDivide(n, tL)),
                    Least(Seq(qL, Remainder(n, tL)))),
                  valueOf = (rnk, _, n) => {
                    val s = IntegralDivide(n, tL)
                    val r = Remainder(n, tL)
                    val padded = Multiply(Add(s, Literal(1L)), r)
                    Cast(If(LessThanOrEqual(rnk, padded),
                      // ceil(rnk / (s+1))
                      IntegralDivide(Add(rnk, s), Add(s, Literal(1L))),
                      // r + ceil((rnk − (s+1)·r) / s)
                      Add(r, IntegralDivide(
                        Add(Subtract(rnk, padded), Subtract(s, Literal(1L))), s))),
                      IntegerType)
                  })
              }
            }
        }
    }

  private sealed trait Kind
  private case object RowNumKind extends Kind
  private case object RankKind extends Kind
  private case object DenseKind extends Kind

  private def rankKind(fn: Expression): Option[Kind] = fn match {
    case RowNumber() => Some(RowNumKind)
    case _: Rank => Some(RankKind)
    case _: DenseRank => Some(DenseKind)
    case _ => None
  }

  private sealed trait PrefixKind
  private case object PctKind extends PrefixKind
  private case object CumeKind extends PrefixKind
  private case class NtileKind(t: Int) extends PrefixKind

  private def prefixKind(fn: Expression): Option[PrefixKind] = fn match {
    case _: PercentRank => Some(PctKind)
    case _: CumeDist => Some(CumeKind)
    case NTile(IntegerLiteral(t)) if t > 0 => Some(NtileKind(t))
    case _ => None
  }

  /** conjunct → Some(p) if it bounds the percent_rank column above by
    * a double literal (`pr <= p` / `pr < p` and mirrors). `<` is safe
    * under the same over-approximate bound: the predicate is
    * re-applied exactly after reconstruction.
    */
  private def pctBound(e: Expression, a: Attribute): Option[Double] = e match {
    case LessThanOrEqual(x: Attribute, Literal(p: Double, DoubleType)) if x.semanticEquals(a) => Some(p)
    case LessThan(x: Attribute, Literal(p: Double, DoubleType)) if x.semanticEquals(a) => Some(p)
    case GreaterThanOrEqual(Literal(p: Double, DoubleType), x: Attribute) if x.semanticEquals(a) => Some(p)
    case GreaterThan(Literal(p: Double, DoubleType), x: Attribute) if x.semanticEquals(a) => Some(p)
    case _ => None
  }

  /** conjunct → Some(q) if it bounds the ntile column to buckets ≤ q. */
  private def ntileBound(e: Expression, a: Attribute): Option[Int] = e match {
    case LessThanOrEqual(x: Attribute, IntegerLiteral(q)) if x.semanticEquals(a) => Some(q)
    case LessThan(x: Attribute, IntegerLiteral(q)) if x.semanticEquals(a) => Some(q - 1)
    case GreaterThanOrEqual(IntegerLiteral(q), x: Attribute) if x.semanticEquals(a) => Some(q)
    case GreaterThan(IntegerLiteral(q), x: Attribute) if x.semanticEquals(a) => Some(q - 1)
    case EqualTo(x: Attribute, IntegerLiteral(1)) if x.semanticEquals(a) => Some(1)
    case EqualTo(IntegerLiteral(1), x: Attribute) if x.semanticEquals(a) => Some(1)
    case _ => None
  }

  /** Count-join-heap shape shared by the percent_rank and ntile
    * prefixes: per-group `count(1)` (group-cardinality-sized) joined
    * back null-safely on the partition keys, [[PrefixRowsAgg]] bounded
    * by `kOf(n)`, then the payload + the window value reconstructed
    * from (rnk, n) by `valueOf` under the original exprIds, and the
    * ORIGINAL window-column conjuncts re-applied — the heap bound
    * over-approximates; the re-filter makes the selection exact.
    */
  private def rewritePrefix(child: LogicalPlan, part: Seq[Expression],
      order: Seq[SortOrder], wattr: Attribute,
      wConjs: Seq[Expression], rest: Seq[Expression], rankSem: Boolean,
      kOf: Expression => Expression,
      valueOf: (Expression, Expression, Expression) => Expression): LogicalPlan = {
    val gAliases = part.zipWithIndex.map { case (e, i) => Alias(e, s"__gk$i")() }
    val nAlias = Alias(Count(Literal(1)).toAggregateExpression(), "__grp_n")()
    val counts = Aggregate(part, gAliases :+ nAlias, child)
    val joinCond = part.zip(gAliases).map { case (e, ga) =>
      EqualNullSafe(e, ga.toAttribute): Expression }.reduceOption(And)
    val joined = Join(child, counts, Inner, joinCond, JoinHint.NONE)
    val nAttr = nAlias.toAttribute
    val payload = CreateStruct(child.output :+ nAttr)
    val aggFn = PrefixRowsAgg(rankSem, order.map(_.child),
      order.map(_.direction == Ascending),
      order.map(_.nullOrdering == NullsFirst),
      kOf(nAttr), payload, maxRows = maxTieRows)
    val arr = Alias(aggFn.toAggregateExpression(), "prefix_rows")()
    val agg = Aggregate(part, Seq(arr), joined)
    val elemType = aggFn.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType
    val item = AttributeReference("item", elemType, nullable = false)()
    val gen = Generate(Explode(arr.toAttribute), unrequiredChildIndex = Seq(0),
      outer = false, qualifier = None, generatorOutput = Seq(item), agg)
    val rowField = GetStructField(item, 2, Some("row"))
    val cols = child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(rowField, i, Some(a.name)), a.name)(
        exprId = a.exprId, qualifier = a.qualifier)
    }
    val rnkExpr = GetStructField(item, 0, Some("rnk"))
    val endExpr = GetStructField(item, 1, Some("pend"))
    val nExpr = GetStructField(rowField, child.output.length, Some("__grp_n"))
    val wCol = Alias(valueOf(rnkExpr, endExpr, nExpr), wattr.name)(exprId = wattr.exprId)
    val proj = Project(cols :+ wCol, gen)
    Filter((wConjs ++ rest).reduce(And), proj)
  }

  private def rewrite(child: LogicalPlan, part: Seq[Expression],
      order: Seq[SortOrder], k: Int, rn: Attribute,
      rest: Seq[Expression]): LogicalPlan = {
    val payload = CreateStruct(child.output)
    val aggFn = TopKRowsAgg(k, order.map(_.child),
      order.map(_.direction == Ascending),
      order.map(_.nullOrdering == NullsFirst), payload)
    val arr = Alias(aggFn.toAggregateExpression(), "topk_rows")()
    val agg = Aggregate(part, Seq(arr), child)
    val pos = AttributeReference("pos", IntegerType, nullable = false)()
    val item = AttributeReference("item", payload.dataType, nullable = false)()
    val gen = Generate(PosExplode(arr.toAttribute), unrequiredChildIndex = Seq(0),
      outer = false, qualifier = None, generatorOutput = Seq(pos, item), agg)
    // original columns + the rank, under their ORIGINAL exprIds —
    // parent operators keep resolving unchanged
    val cols = child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(item, i, Some(a.name)), a.name)(
        exprId = a.exprId, qualifier = a.qualifier)
    }
    val rnCol = Alias(Add(pos, Literal(1)), rn.name)(exprId = rn.exprId)
    val proj = Project(cols :+ rnCol, gen)
    if (rest.isEmpty) proj else Filter(rest.reduce(And), proj)
  }

  /** rank()/dense_rank() variant: the aggregate emits
    * `array<struct<rnk, row>>` (tie groups share a rank), so the rank
    * is projected from the element instead of the explode position.
    */
  private def rewriteRankLike(child: LogicalPlan, part: Seq[Expression],
      order: Seq[SortOrder], k: Int, rn: Attribute,
      rest: Seq[Expression], dense: Boolean): LogicalPlan = {
    val payload = CreateStruct(child.output)
    val aggFn = RankRowsAgg(k, dense, order.map(_.child),
      order.map(_.direction == Ascending),
      order.map(_.nullOrdering == NullsFirst), payload,
      maxRows = math.max(k, maxTieRows))
    val arr = Alias(aggFn.toAggregateExpression(), "rankk_rows")()
    val agg = Aggregate(part, Seq(arr), child)
    val elemType = aggFn.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType
    val item = AttributeReference("item", elemType, nullable = false)()
    val gen = Generate(Explode(arr.toAttribute), unrequiredChildIndex = Seq(0),
      outer = false, qualifier = None, generatorOutput = Seq(item), agg)
    val rowField = GetStructField(item, 1, Some("row"))
    val cols = child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(rowField, i, Some(a.name)), a.name)(
        exprId = a.exprId, qualifier = a.qualifier)
    }
    val rnCol = Alias(GetStructField(item, 0, Some("rnk")), rn.name)(exprId = rn.exprId)
    val proj = Project(cols :+ rnCol, gen)
    if (rest.isEmpty) proj else Filter(rest.reduce(And), proj)
  }
}
