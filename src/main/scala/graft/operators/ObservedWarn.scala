package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Action-time warning counters for capped operators — the
  * no-silent-caps rule WITHOUT an eager driver job.
  *
  * Several operators bound their work by excluding degenerate keys
  * (hub vertices in [[Graph.cappedWedgeCounts]], saturated LSH buckets
  * in [[graft.streaming.DedupIndexStream]]) and must TELL the user how
  * much was excluded. Counting that eagerly at DataFrame-construction
  * time breaks the lazy-builder contract every operator here follows:
  * plan-only consumers (the ExplainAuditSpec registry sweep, `explain`)
  * would execute the full upstream pipeline just to build a plan, and
  * the counted frame re-executes for the real join since nothing is
  * persisted. Instead the count rides the plan as a
  * `Dataset.observe` aggregate — zero extra jobs, computed by the SAME
  * action that consumes the frame — and a once-per-session
  * [[QueryExecutionListener]] turns any fired metric into the warning
  * log line. Plan-only consumers never trigger it; every real action
  * does.
  *
  * Metric names are made unique per call-site invocation (Spark
  * rejects duplicate observation names inside one plan, and one query
  * may embed the same operator twice); the listener matches on the
  * stable prefix.
  *
  * CAVEAT (AQE empty-result pruning, verified empirically): when the
  * query's RESULT is empty, adaptive execution can finish through an
  * EmptyRelation node whose final physical plan no longer contains the
  * CollectMetrics operator, so the metric is not reported even though
  * its stage may have run (measured on the capped LSH self-join whose
  * surviving buckets were all singletons — zero output pairs, final
  * plan `ResultQueryStage <- EmptyRelation`, observed metrics empty;
  * a manual AdaptiveSparkPlanHelper walk of the executed plan finds
  * nothing either, because the pruned tree is logical). That is the
  * TOTAL-truncation case, whose empty output is self-evidently
  * degenerate; the warning's purpose is the PARTIAL silent truncation,
  * where surviving rows keep the plan alive and the metric reports —
  * the specs pin exactly that case.
  */
object ObservedWarn {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val seq = new AtomicLong(0L)
  // message renderers by full metric name. Bounded two ways: an entry
  // leaves when its warning is actually LOGGED (n > 0 — an n == 0
  // report keeps the renderer, so a frame whose first action observes
  // zero excluded rows can still warn on a later action over moved
  // data), and renderers for plan-only / never-executed frames fall
  // off the FIFO end at MaxPending (insertion-ordered LinkedHashMap)
  // instead of accumulating forever in a long-lived service
  private val MaxPending = 4096
  // evictions are silent by design (bounded-ness beats completeness for
  // never-executed plan-only frames) but must be OBSERVABLE: each one
  // logs at debug and bumps a counter the spec asserts on — a deployment
  // with heavy plan churn can see it is losing armed renderers. The
  // count is ALSO attributed per renderer PREFIX (the stable call-site
  // name before '#'): a global number says armed warnings are being
  // lost, the per-prefix split says WHICH operator's — the difference
  // between "plan churn somewhere" and "the LSH cap warning is blind".
  // The attribution map is bounded by the number of distinct call-site
  // prefixes in the process (a static property of the code, not of the
  // workload), so it cannot itself grow without bound.
  private val evictions = new AtomicLong(0L)
  private val evictionsByPrefix = new ConcurrentHashMap[String, Long]()
  private val pending: java.util.Map[String, Long => String] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Long => String](16, 0.75f, false) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Long => String]): Boolean = {
          val evict = size() > MaxPending
          if (evict) {
            evictions.incrementAndGet()
            val cut = e.getKey.lastIndexOf('#')
            val prefix = if (cut > 0) e.getKey.substring(0, cut) else e.getKey
            val perKey = evictionsByPrefix.merge(prefix, 1L,
              (a: Long, b: Long) => a + b)
            log.debug(s"ObservedWarn: renderer '${e.getKey}' evicted at " +
              s"the $MaxPending-entry FIFO cap while still armed — its " +
              "warning (if the frame ever executes with a nonzero count) " +
              s"is lost ($perKey eviction(s) for '$prefix' so far); " +
              "heavy plan churn between actions is the usual cause")
          }
          evict
        }
      })
  // last fired value by metric PREFIX — test hook (specs assert the
  // cap actually fired with the expected count)
  private val fired = new ConcurrentHashMap[String, Long]()
  // WEAK keys: the set must not pin a stopped session in a JVM with
  // session churn — a collected session simply re-registers nothing
  // (its listener died with it)
  private val registered: java.util.Set[SparkSession] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Attach a warn-on-nonzero observed metric to `df`. `metric` must
    * be an aggregate expression yielding a LONG (e.g.
    * `sum(when(cond, 1L).otherwise(0L))`). The warning `msg(n)` is
    * logged when the observing action completes with n > 0. */
  def apply(df: DataFrame, prefix: String, metric: Column,
      msg: Long => String): DataFrame = {
    ensureListener(df.sparkSession)
    val name = s"$prefix#${seq.incrementAndGet()}"
    pending.put(name, msg)
    df.observe(name, metric.as("n"))
  }

  /** Test hook: the value the most recent fired metric with this
    * prefix reported (None if no action has run one yet). */
  private[graft] def lastFired(prefix: String): Option[Long] =
    Option(fired.get(prefix))

  private[graft] def clearFired(prefix: String): Unit = {
    fired.remove(prefix); ()
  }

  /** Test hooks for the bounded structures. */
  private[graft] def pendingContains(prefix: String): Boolean =
    pending.synchronized {
      val it = pending.keySet().iterator()
      var found = false
      while (!found && it.hasNext) found = it.next().startsWith(prefix + "#")
      found
    }
  private[graft] def pendingSize: Int = pending.size()
  private[graft] def registeredCount: Int = registered.size()
  private[graft] def evictionCount: Long = evictions.get()
  private[graft] def evictionCount(prefix: String): Long =
    Option(evictionsByPrefix.get(prefix)).getOrElse(0L)
  /** Test hook: insert a renderer without building a DataFrame (the
    * spec drives the FIFO to its cap without 4096 observe plans). */
  private[graft] def putRenderer(name: String, msg: Long => String): Unit =
    pending.put(name, msg)

  private def ensureListener(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
              val cut = name.lastIndexOf('#')
              if (cut > 0 && (pending.containsKey(name) ||
                  fired.containsKey(name.substring(0, cut)))) {
                val prefix = name.substring(0, cut)
                val n =
                  if (row == null || row.isNullAt(0)) 0L else row.getLong(0)
                // a self-join duplicates the node; an unexecuted copy
                // reports 0 — keep the max so it cannot mask the
                // executed copy's count
                fired.merge(prefix, n, (a: Long, b: Long) => math.max(a, b))
                // remove the renderer only when the warning is LOGGED:
                // an n == 0 report keeps it armed for a later action
                // (one-shot-per-name suppression = the removal itself)
                if (n > 0L) {
                  val renderer = pending.remove(name)
                  if (renderer != null) log.warn(renderer(n))
                }
              }
            }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
}
