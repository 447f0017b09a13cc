package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The ONE seam onto Spark private APIs the repo needs (three call
  * sites, all reflective because the members are `private[sql]` at
  * COMPILE time but public in bytecode):
  *
  *   1. `SparkSession.internalCreateDataFrame` — the standard way for a
  *      v1 streaming `Source` to hand the engine a derived plan's
  *      InternalRow RDD ([[graft.streaming.LakeChangeFeedSource]]).
  *   2. `org.apache.spark.sql.internal.SortOrder` accessors — reading
  *      direction/null-ordering/child off a `Column.node` sort
  *      expression ([[graft.operators.LayoutOps.globalNtile]]).
  *   3. the `Column(ColumnNode)` constructor — re-wrapping the
  *      SortOrder's child node as a public `Column`.
  *
  * Every handle is resolved EAGERLY in this object's static init and
  * fails with a versioned message, so a Spark minor upgrade that
  * changes any of these internals breaks the FIRST touch of this
  * object (and ShimsSpec) with a diagnosis, not a random call site at
  * runtime with a bare `NoSuchMethodException`. Main code must not
  * call `getMethod`/`invoke` on Spark internals anywhere else
  * (grep-pinned by ShimsSpec).
  */
object SparkShims {

  private def resolving[T](what: String)(f: => T): T =
    try f catch {
      case t: Throwable =>
        throw new IllegalStateException(
          s"SparkShims: cannot resolve $what against Spark " +
            s"${org.apache.spark.SPARK_VERSION} — this private-API seam " +
            "needs updating for the new Spark release", t)
    }

  // -- seam 1: SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)
  private val internalCreateMethod = resolving(
    "SparkSession.internalCreateDataFrame(RDD, StructType, boolean)") {
    classOf[SparkSession].getMethod("internalCreateDataFrame",
      classOf[RDD[_]], classOf[StructType], java.lang.Boolean.TYPE)
  }

  // -- seam 2: sql-api SortOrder node accessors
  private val sortOrderClass = resolving(
    "org.apache.spark.sql.internal.SortOrder") {
    Class.forName("org.apache.spark.sql.internal.SortOrder")
  }
  private val sortOrderChild = resolving("SortOrder.child") {
    sortOrderClass.getMethod("child")
  }
  private val sortOrderDirection = resolving("SortOrder.sortDirection") {
    sortOrderClass.getMethod("sortDirection")
  }
  private val sortOrderNullOrdering = resolving("SortOrder.nullOrdering") {
    sortOrderClass.getMethod("nullOrdering")
  }

  // -- seam 3: new Column(ColumnNode)
  private val columnCtor = resolving("Column(ColumnNode) constructor") {
    classOf[Column].getConstructor(
      Class.forName("org.apache.spark.sql.internal.ColumnNode"))
  }

  /** A derived (already-analyzed) plan's InternalRow RDD as a DataFrame
    * under `schema` — streaming-tagged when `isStreaming`, which is what
    * a v1 `Source.getBatch` must return.
    */
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[_],
      schema: StructType, isStreaming: Boolean): DataFrame =
    internalCreateMethod.invoke(spark, rdd, schema,
      java.lang.Boolean.valueOf(isStreaming)).asInstanceOf[DataFrame]

  /** If `c` is a sort expression (`desc(...)`, `asc_nulls_last(...)`, …),
    * its (child column, isDescending, isNullsLast); None for a bare
    * column. The node type is matched by class, never by name-string.
    */
  def sortOrderInfo(c: Column): Option[(Column, Boolean, Boolean)] =
    if (!sortOrderClass.isInstance(c.node)) None
    else {
      val node = c.node
      val child = columnCtor.newInstance(sortOrderChild.invoke(node))
        .asInstanceOf[Column]
      val desc = sortOrderDirection.invoke(node)
        .getClass.getSimpleName.startsWith("Descending")
      val nullsLast = sortOrderNullOrdering.invoke(node)
        .getClass.getSimpleName.startsWith("NullsLast")
      Some((child, desc, nullsLast))
    }
}
