package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, In, IsNotNull, Literal, Or}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: collapse `Union(Filter(p₁, R), Filter(p₂, R))` into
  * `Filter(p₁ ∨ p₂, R)` when both branches scan the same relation and
  * the predicates are provably disjoint IN/equality sets over the same
  * key expression.
  *
  * Motivation (SURVEY.md §4.1/§4.3a): the reference's delivery filter is
  * a two-branch filtered union over one source; Catalyst does not merge
  * it, so the source is scanned twice. Bag-semantics correctness demands
  * disjointness — a row matching both predicates must appear twice in
  * the union but would appear once through the merged filter — so the
  * rule only fires when the literal value sets cannot overlap. At scale
  * this halves the scan I/O of every config-driven indicator pipeline.
  *
  * Disabled with spark.graft.mergeDisjointFilterUnions=false.
  */
object MergeDisjointFilterUnions extends Rule[LogicalPlan] {

  private case class KeyedInSet(key: Expression, values: Set[Any])

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def asBareInSet(e: Expression): Option[KeyedInSet] = e match {
    case In(k, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      Some(KeyedInSet(k.canonicalized, vs.map(_.asInstanceOf[Literal].value).toSet))
    case EqualTo(k, l: Literal) => Some(KeyedInSet(k.canonicalized, Set(l.value)))
    case EqualTo(l: Literal, k) => Some(KeyedInSet(k.canonicalized, Set(l.value)))
    case _ => None
  }

  /** Predicate as (canonicalized key, literal value set). Earlier
    * optimizer batches (InferFiltersFromConstraints) conjoin redundant
    * IsNotNull guards onto the IN/equality term; those are implied by the
    * IN itself (null key → null predicate → row filtered), so a
    * conjunction of one IN-term plus IsNotNull terms over the same
    * attributes still qualifies.
    */
  private def asInSet(e: Expression): Option[KeyedInSet] = {
    val (inTerms, rest) = splitConjuncts(e).partition(asBareInSet(_).isDefined)
    inTerms match {
      case Seq(one) if rest.forall {
            case nn: IsNotNull => nn.references.subsetOf(one.references)
            case _ => false
          } =>
        asBareInSet(one)
      case _ => None
    }
  }

  /** Re-express `cond` (over `from`'s output) in terms of `to`'s output. */
  private def remap(cond: Expression, from: LogicalPlan, to: LogicalPlan): Expression = {
    val mapping = from.output.map(_.exprId).zip(to.output).toMap
    cond.transform { case a: AttributeReference => mapping.getOrElse(a.exprId, a) }
  }

  private def tryMerge(a: LogicalPlan, b: LogicalPlan): Option[LogicalPlan] = (a, b) match {
    case (Filter(ca, childA), Filter(cb, childB))
        if ca.deterministic && cb.deterministic && childA.sameResult(childB) =>
      val cbOnA = remap(cb, childB, childA)
      for {
        ia <- asInSet(ca)
        ib <- asInSet(cbOnA)
        if ia.key == ib.key
        if ia.values.intersect(ib.values).isEmpty
      } yield Filter(Or(ca, cbOnA), childA)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.mergeDisjointFilterUnions", "true").toBoolean) {
      return plan
    }
    plan.transformUp {
      case u: Union =>
        val merged = u.children.foldLeft(List.empty[LogicalPlan]) {
          case (head :: tail, next) =>
            tryMerge(head, next).map(_ :: tail).getOrElse(next :: head :: tail)
          case (Nil, next) => next :: Nil
        }.reverse
        if (merged.length == u.children.length) u
        else if (merged.length == 1) merged.head
        else u.copy(children = merged)
    }
  }
}

/** Session-extension registration: either declaratively via
  * `spark.sql.extensions=graft.plans.GraftExtensions` or imperatively
  * with [[GraftExtensions.install]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => MergeDisjointFilterUnions)
    ext.injectOptimizerRule(_ => TopKViaWindowRewrite)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ()
  }
}

object GraftExtensions {
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(MergeDisjointFilterUnions)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ Seq(MergeDisjointFilterUnions, TopKViaWindowRewrite)
    }
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
  }
}
