package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** Session-scoped REGISTER-ONCE bridge for the library's constant-builder
  * temp functions (round 10, VERDICT item 7).
  *
  * Every operator that needs `kgrams`/`cosine_sim`/… calls `register()`
  * lazily at plan-build time, so a 229-query sweep re-registered each name
  * dozens of times and Spark's registry logged `WARN ... replaced a
  * previously registered function` on every replacement — burying the
  * WARNs that matter (codegen fallback, state-store eviction) in Verify
  * and Bench logs. These builders are PURE CONSTANTS (the same expression
  * constructor every call), so replacing is never needed: check the
  * session registry first and register only on first use.
  *
  * NOT for parameterized registrations whose builder closes over run
  * state (e.g. [[Pq.register]]'s per-codebook functions) — there the
  * replace semantics are intentional and the names are unique per call.
  */
object Registry {
  /** check-then-act, synchronized on the session registry (round-10
    * ADVICE): the race was benign for these constant builders (both
    * winners register the identical expression constructor), but the
    * class invites reuse and a future non-idempotent builder must not
    * inherit a latent double-register. */
  def registerOnce(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    val reg = castToImpl(spark).sessionState.functionRegistry
    reg.synchronized {
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
