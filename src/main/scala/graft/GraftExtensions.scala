package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions.call_function
import graft.functions.CosineSimilarity

/** Session extension registering graft's native expressions, for use via
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier(CosineSimilarity.name), CosineSimilarity.info,
        CosineSimilarity.builder))
  }
}

object GraftFunctions {
  /** Idempotent runtime registration — for sessions (like the driver's)
    * that were built without the extensions conf. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(CosineSimilarity.name)
    if (!reg.functionExists(id))
      reg.registerFunction(id, CosineSimilarity.info, CosineSimilarity.builder)
  }

  /** Column API for the native cosine (registers on first use). */
  def cosineNative(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function(CosineSimilarity.name, a, b)
  }
}
