package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent temp-function registration. Operators call `register`
  * per invocation (each must work on a bare session), but
  * `createOrReplaceTempFunction` logs a WARN on every replace — at
  * bench scale that is thousands of `the function dotp replaced a
  * previously registered function` lines drowning real diagnostics.
  * Registration is keyed on the session's own registry, so a new
  * session (fresh registry) registers cleanly and an existing one is
  * left alone. */
object Registry {
  def registerOnce(spark: SparkSession, name: String)
                  (builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "internal")
  }
}
