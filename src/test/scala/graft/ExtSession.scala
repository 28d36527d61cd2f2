package graft

import org.apache.spark.sql.SparkSession

/** Shared extensions-enabled test session (one per JVM), used by
  * ExtensionsSpec and the SqlParitySpec kernel battery.
  *
  * getOrCreate returns an existing default session and would silently
  * skip the extensions config, so detach the shared suite session while
  * building this one (they share one SparkContext), then restore it.
  * `spark.sql.extensions` is a STATIC conf read from the SparkContext's
  * conf at session construction — when another suite created the
  * context first (suite order is not fixed), the config line alone
  * silently does nothing. `withExtensions` is the public builder API
  * that applies the same injector deterministically on a shared
  * context, so tests exercise the identical injectFunction /
  * injectOptimizerRule surface regardless of which suite ran first;
  * the config line stays as production documentation (it IS the
  * mechanism when the context is born with it, i.e. spark-submit).
  */
object ExtSession {
  lazy val spark: SparkSession = {
    // Force the SHARED suite session to exist FIRST: if an ext-using
    // suite runs before any SparkSuite-based one, the ext session would
    // be left as the thread's active session after a test action, and
    // the shared lazy getOrCreate in a later suite would silently ADOPT
    // it — extensions rules and all (observed: PlanSpec's lateral test
    // seeing a GroupTopK plan only when ExtensionsSpec ran first).
    SparkSuite.spark
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    prevDefault match {
      case Some(p) => SparkSession.setDefaultSession(p)
      case None => SparkSession.clearDefaultSession()
    }
    prevActive match {
      case Some(p) => SparkSession.setActiveSession(p)
      case None => SparkSession.clearActiveSession()
    }
    s
  }
}
