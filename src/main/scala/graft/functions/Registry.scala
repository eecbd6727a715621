package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** THE session-function registration point shared by
  * [[VectorExprs]]/[[HashExprs]]/[[BitExprs]]: one synchronized
  * check-then-register (the 8-wide concurrent verify driver races an
  * unlocked guard and spams "replaced a previously registered function"
  * WARNs — the lock existed in one of the three twins and not the
  * others) and one arity gate producing Spark's standard
  * wrong-number-of-arguments analysis error instead of an
  * IndexOutOfBoundsException escaping the builder lambda. */
private[functions] object Registry {
  private val lock = new Object

  def ensure(spark: SparkSession, name: String, arity: Int,
      build: Seq[Expression] => Expression): Unit = lock.synchronized {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name))) {
      reg.createOrReplaceTempFunction(name, exprs => {
        if (exprs.length != arity)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map("functionName" -> name,
              "expectedNum" -> arity.toString,
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        build(exprs)
      }, "built-in")
    }
  }
}
