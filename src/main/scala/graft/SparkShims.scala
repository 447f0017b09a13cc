package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType

/** The ONE seam onto Spark private APIs the repo needs (four call
  * sites, all reflective because the members are `private[sql]` at
  * COMPILE time but public in bytecode):
  *
  *   1. `classic.SparkSession.internalCreateDataFrame` — the standard
  *      way for a v1 streaming `Source` to hand the engine a derived
  *      plan's InternalRow RDD ([[graft.streaming.LakeChangeFeedSource]]).
  *      NOTE: in Spark 4.x the method lives on
  *      `org.apache.spark.sql.classic.SparkSession`, NOT on the
  *      abstract sql-api `SparkSession` — resolve against the classic
  *      class (Class.getMethod does not search subclasses).
  *   2. `org.apache.spark.sql.internal.SortOrder` accessors — reading
  *      direction/null-ordering/child off a `Column.node` sort
  *      expression ([[graft.operators.LayoutOps.globalNtile]]).
  *   3. the `Column(ColumnNode)` constructor — re-wrapping the
  *      SortOrder's child node as a public `Column`.
  *   4. `classic.Dataset.ofRows` — wrapping a custom LogicalPlan as a
  *      DataFrame ([[graft.plans.AsOfJoin]]); public API through Spark
  *      3, `private[sql]` since the 4.x classic/connect split.
  *
  * Each seam's handles resolve in their own INDEPENDENT `lazy val`
  * (one broken seam must not poison the others — learned the hard way
  * when an eager shared `<clinit>` took down SortOrder over a
  * SparkSession typo) and fail with a versioned message, so a Spark
  * minor upgrade that changes one of these internals breaks the first
  * touch of THAT seam (and ShimsSpec, which resolves all four) with a
  * diagnosis, not a bare `NoSuchMethodException`. Main code must not
  * call `getMethod`/`invoke` on Spark internals anywhere else
  * (grep-pinned by [[graft.ShimsSpec]]).
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

  // -- seam 1: classic.SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)
  private lazy val internalCreateMethod = resolving(
    "classic.SparkSession.internalCreateDataFrame(RDD, StructType, boolean)") {
    Class.forName("org.apache.spark.sql.classic.SparkSession")
      .getMethod("internalCreateDataFrame",
        classOf[RDD[_]], classOf[StructType], java.lang.Boolean.TYPE)
  }

  // -- seam 2: sql-api SortOrder node accessors
  private lazy val sortOrderHandles: (Class[_], java.lang.reflect.Method,
      java.lang.reflect.Method, java.lang.reflect.Method) = resolving(
    "org.apache.spark.sql.internal.SortOrder accessors") {
    val cls = Class.forName("org.apache.spark.sql.internal.SortOrder")
    (cls, cls.getMethod("child"), cls.getMethod("sortDirection"),
      cls.getMethod("nullOrdering"))
  }

  // -- seam 3: new Column(ColumnNode)
  private lazy val columnCtor = resolving("Column(ColumnNode) constructor") {
    classOf[Column].getConstructor(
      Class.forName("org.apache.spark.sql.internal.ColumnNode"))
  }

  // -- seam 4: classic.Dataset.ofRows(SparkSession, LogicalPlan)
  private lazy val ofRowsHandle = resolving(
    "classic.Dataset.ofRows(SparkSession, LogicalPlan)") {
    val cls = Class.forName("org.apache.spark.sql.classic.Dataset$")
    val module = cls.getField("MODULE$").get(null)
    val m = cls.getMethods.find(m =>
      m.getName == "ofRows" && m.getParameterCount == 2).get
    (module, m)
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
  def sortOrderInfo(c: Column): Option[(Column, Boolean, Boolean)] = {
    val handles = sortOrderHandles
    val cls = handles._1
    val (childM, dirM, nullsM) = (handles._2, handles._3, handles._4)
    if (!cls.isInstance(c.node)) None
    else {
      val node = c.node
      val child = columnCtor.newInstance(childM.invoke(node))
        .asInstanceOf[Column]
      val desc = dirM.invoke(node)
        .getClass.getSimpleName.startsWith("Descending")
      val nullsLast = nullsM.invoke(node)
        .getClass.getSimpleName.startsWith("NullsLast")
      Some((child, desc, nullsLast))
    }
  }

  /** A custom (or otherwise hand-built) LogicalPlan wrapped as a public
    * DataFrame — `Dataset.ofRows`, reflective since the 4.x split made
    * it `private[sql]`.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame = {
    val (module, m) = ofRowsHandle
    m.invoke(module, spark, plan).asInstanceOf[DataFrame]
  }
}
