package graft.plans

import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan capture hook for the EAGER-query corpus-broadcast audit
  * ([[graft.Scale]]): eager registry queries execute their pipelines
  * during CONSTRUCTION and return a LocalRelation, so the lazy plan audit
  * has nothing to inspect — their internal plans at blown-up stats were
  * the audit's last uninspected class (r17). This rule is injected as a
  * query-stage-prep rule on every Engine session and hands each
  * AQE-planned execution's initial physical plan to the active sink; when
  * no sink is armed (always, outside an audit run) it is a volatile read
  * and an identity.
  *
  * Why query-stage-prep: it runs SYNCHRONOUSLY inside the executing
  * action (AdaptiveSparkPlanExec applies preparations before breaking the
  * plan into stages), so the audit needs no listener-bus draining. The
  * FIRST capture per action is the full initial physical plan — the same
  * tree the lazy audit reads off `queryExecution.sparkPlan`; AQE
  * RE-OPTIMIZATIONS fire the rule again with re-planned trees whose
  * materialized stages appear as opaque QueryStageExec leaves (invisible
  * to the flag walk — conservative: the initial capture already carried
  * the full tree, and a consumer must NOT assume one capture per action
  * or leaf visibility in later captures). Coverage = AQE-planned batch
  * actions; V1 file-write commands and stateful streaming micro-batches
  * don't pass through it — the former are fixture lands, the latter are
  * the audit's separately-skipped streaming class. */
object PlanCapture extends Rule[SparkPlan] {

  @volatile private[graft] var sink: Option[java.util.Queue[SparkPlan]] = None

  /** Count of MICRO-BATCH plans offered by StreamingOps.drain since the
    * audit last reset it — kept separate from the queue because a
    * streaming harness's batch sub-jobs (fixture lands, foreachBatch
    * bodies, read-backs) also feed the queue via the stage-prep hook: a
    * broken drain reflection would otherwise hide behind a non-empty
    * queue and silently cost the audit exactly the micro-batch coverage
    * it exists for (r17 review). */
  private[graft] val streamingOffers = new java.util.concurrent.atomic.AtomicInteger(0)

  override def apply(plan: SparkPlan): SparkPlan = {
    sink.foreach(_.add(plan))
    plan
  }
}
