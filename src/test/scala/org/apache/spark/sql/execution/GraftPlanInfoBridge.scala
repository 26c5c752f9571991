package org.apache.spark.sql.execution

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.execution.ui.{SparkListenerSQLAdaptiveExecutionUpdate, SparkListenerSQLExecutionStart}

/** Test-only bridge into Spark's `private[sql]` plan-event surface.
  *
  * The executed-plan sweep (ExecutedPlanSweepSpec) needs the AQE-FINAL
  * physical plan of every SQL execution a gate triggers — including
  * streaming micro-batches and write jobs, which never surface through
  * `df.queryExecution`. Those plans are broadcast on the listener bus as
  * `SparkPlanInfo` trees (execution start + adaptive updates), a type
  * that is `private[sql]`; this object lives in the Spark package
  * namespace purely to copy them into a graft-visible `Node` tree.
  */
object GraftPlanInfoBridge {

  /** graft-visible copy of a SparkPlanInfo tree. */
  final case class Node(nodeName: String, simpleString: String,
                        children: Seq[Node]) {
    def exists(p: Node => Boolean): Boolean =
      p(this) || children.exists(_.exists(p))
  }

  private def toNode(i: SparkPlanInfo): Node =
    Node(i.nodeName, i.simpleString, i.children.map(toNode))

  /** Keeps the LATEST plan tree per SQL execution id — adaptive updates
    * overwrite the start event's tree, so what remains is the AQE-final
    * shape that actually ran.
    */
  final class Capture extends SparkListener {
    val plans = new java.util.concurrent.ConcurrentHashMap[Long, Node]()
    override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
      case e: SparkListenerSQLExecutionStart =>
        plans.put(e.executionId, toNode(e.sparkPlanInfo))
      case e: SparkListenerSQLAdaptiveExecutionUpdate =>
        plans.put(e.executionId, toNode(e.sparkPlanInfo))
      case _ => ()
    }
  }

  /** The listener bus is async; block until queued events are delivered
    * so a gate's executions are attributed to the right gate.
    */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
