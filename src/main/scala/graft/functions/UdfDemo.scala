package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** The declared scalar-UDF surface (SURVEY.md §2.10): ONE demo function,
  * deliberately kept OFF every oracle query path.
  *
  * Why UDFs stay off the hot paths: a Scala UDF is a black box to
  * Catalyst — no predicate pushdown through it, no constant folding, no
  * null-propagation inference, and it breaks the whole-stage-codegen
  * span it sits in (row-at-a-time Invoke with serialization at the
  * boundary). Every production operator in this engine uses builtin
  * expressions or custom codegen'd Catalyst expressions instead
  * (functions.HashExprs, functions.SimilarityExprs). A UDF is the
  * correct tool only when the logic is genuinely opaque (external
  * library calls) — for everything else the builtin-expression form
  * [[normalizeTextExpr]] is what a query should use, and UdfDemoSpec
  * pins the two to identical outputs.
  */
object UdfDemo {

  /** Text normalization as a scalar UDF: trim, lowercase, collapse
    * whitespace runs. Null-safe (Spark passes nulls through for
    * `null`-returning UDFs only if declared with Option or asNonNullable
    * is avoided — here we handle null explicitly). */
  val normalizeTextUdf: UserDefinedFunction = udf { (s: String) =>
    if (s == null) null
    else s.trim.toLowerCase.replaceAll("\\s+", " ")
  }

  /** The same normalization as builtin (codegen'd) expressions — what an
    * oracle query would actually use. */
  def normalizeTextExpr(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))
}
