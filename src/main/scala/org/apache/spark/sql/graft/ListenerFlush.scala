package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Driver-side flush of the async Spark listener bus. The bus delivers
  * events on its own threads (HarnessGuardSpec has to poll up to 10 s
  * for one), so a consumer that drains
  * [[graft.streaming.HarnessGuard]]'s queue right after a query can
  * misattribute an in-flight failure event to the NEXT query — or drop
  * events entirely after the last drain. Flushing the bus first makes
  * the drain a consistent snapshot. Lives in this package because
  * `SparkContext.listenerBus` and `waitUntilEmpty` are
  * `private[spark]`.
  */
object ListenerFlush {
  /** Block until every queued listener event is delivered (bounded by
    * `timeoutMillis` — a wedged bus should degrade to the old
    * unflushed behavior, never hang the bench).
    */
  def flush(spark: SparkSession, timeoutMillis: Long = 10000L): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
