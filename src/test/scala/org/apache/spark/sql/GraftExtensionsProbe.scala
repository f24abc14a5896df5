package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry

/** Test-only probe living in Spark's package to reach the private[sql]
  * extension-application hook: applies an extensions builder to a fresh
  * registry exactly the way session construction does, without having to
  * build (and stop — which would kill the shared test SparkContext) a
  * second real session. */
object GraftExtensionsProbe {
  def registeredNames(builder: SparkSessionExtensions => Unit): Seq[String] = {
    val ext = new SparkSessionExtensions
    builder(ext)
    val reg = new SimpleFunctionRegistry
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName)
  }
}
