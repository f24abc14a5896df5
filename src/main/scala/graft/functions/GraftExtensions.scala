package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/** `SparkSessionExtensions` entry point — the deployment-grade way to ship
  * graft's native functions into ANY session of a cluster, including ones
  * the library never touches programmatically:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * }}}
  *
  * `GraftFunctions.register(spark)` remains the in-process equivalent for
  * sessions that already exist (injected extensions only apply to sessions
  * built AFTER the conf is set).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
