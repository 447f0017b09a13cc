package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, DateType}

/** Per-cell dynamic typing as Catalyst column expressions.
  *
  * The reference re-types every cell independently (`convert_data_type`,
  * nci-seronet-data-validator.py:196-206): if the string contains `'_'` at
  * position >= 1 keep it as-is (protects IDs like `12_123456`); else try
  * `float(v)`; else try `dateutil.parser.parse(v)`; else keep the string.
  * Rules then branch on the runtime type of each cell.
  *
  * Spark columns are homogeneous, so we keep every ingested column as
  * StringType and express the trichotomy as predicates over the raw string.
  * Every cell classifies as exactly one of number / datetime / string
  * (property-tested). All expressions are built-ins (`try_cast`,
  * `try_to_timestamp`, `rlike`) — fully codegen'd, no UDFs.
  *
  * Pinned divergences from the reference (documented per SURVEY §1.2):
  *  - dateutil is far more permissive than any fixed format list; we pin the
  *    formats below and treat anything else as a plain string.
  *  - dateutil resolves bare times against *today*; we resolve against
  *    1970-01-01 (deterministic).
  *  - Python `float` accepts `'_5'`-style? No — underscores only *between*
  *    digits (`float("1_000")` is 1000.0) — but the guard fires first for
  *    those, and `float("_5")` raises, so behavior matches.
  */
object CellType {

  /** True when the first `'_'` sits at position >= 1 (`str(v).find('_') > 0`).
    * A leading underscore does NOT trigger the guard.
    */
  def underscoreGuard(c: Column): Column = c.rlike("^[^_].*_")

  /** The cell's numeric value, or null if it isn't a number (guard applied). */
  def asNumber(c: Column): Column =
    when(!underscoreGuard(c), c.try_cast(DoubleType))

  def isNumber(c: Column): Column = asNumber(c).isNotNull

  /** Pinned format cascade standing in for dateutil.parser.parse.
    * Order matters only for rendering (first match wins); membership is what
    * the predicates use.
    */
  val dateTimeFormats: Seq[String] = Seq(
    "yyyy-M-d H:m:s", "yyyy-M-d'T'H:m:s", "M/d/yyyy H:m:s", "M/d/yyyy H:m")
  val dateFormats: Seq[String] = Seq(
    "yyyy-M-d", "M/d/yyyy", "M/d/yy", "yyyy/M/d")
  val timeFormats: Seq[String] = Seq(
    "H:m:s", "h:m:s a", "h:m a", "H:m")

  /** The parsed timestamp under the cascade, or null. Number-guard NOT
    * included — compose with isNumber for the trichotomy (numbers win:
    * `"3"` is a number, never a date).
    *
    * Cheap regex gates short-circuit the exception-driven format parses:
    * only date-shaped strings attempt the date formats and only time-shaped
    * strings the time formats. At 100 TB the cascade dominates the scan
    * cost without this (each failed try_to_timestamp is an internal throw).
    */
  def asTimestampRaw(c: Column): Column = {
    val dateShaped = c.rlike("^\\s*[0-9]{1,4}[-/][0-9]{1,2}[-/][0-9]{1,4}")
    val timeShaped = c.rlike("^\\s*[0-9]{1,2}:[0-9]")
    coalesce(
      // bare dates are the common case — try them before datetime formats
      // (a datetime string cannot match a bare-date format, so ordering
      // changes only attempt count, never the parsed value)
      when(dateShaped, coalesce((dateFormats ++ dateTimeFormats)
        .map(f => try_to_timestamp(c, lit(f))): _*)),
      when(timeShaped, coalesce(timeFormats
        .map(f => try_to_timestamp(c, lit(f))): _*)))
  }

  // ---- memoized per-column variants ----------------------------------
  // RuleEvaluator projects `__num_<col>` / `__ts_<col>` ONCE per sheet scan
  // and every compiled rule branches on those — one parse per cell however
  // many rules reference the column ("parse once, branch many").

  def memoNum(name: String): String = s"__num_$name"
  def memoTs(name: String): String = s"__ts_$name"

  /** The memo projections for a set of referenced columns. The ts memo is
    * guarded on the number memo being null: the trichotomy is number →
    * date → string, so a cell that parsed as a number never consults the
    * cascade — skipping its shape-regexes entirely on numeric columns.
    * (memoNum is projected first, so memoTs can reference it.)
    */
  def memoColumns(names: Seq[String]): Seq[(String, Column)] =
    names.distinct.flatMap { n =>
      Seq(memoNum(n) -> asNumber(col(n)),
        memoTs(n) -> when(col(memoNum(n)).isNull, asTimestampRaw(col(n))))
    }

  def isNumberM(name: String): Column = col(memoNum(name)).isNotNull
  def asNumberM(name: String): Column = col(memoNum(name))
  def isDateTimeM(name: String): Column =
    col(memoNum(name)).isNull && col(memoTs(name)).isNotNull
  def asDateM(name: String): Column =
    when(isDateTimeM(name), col(memoTs(name))).cast(DateType)
  def isStringM(name: String): Column =
    col(memoNum(name)).isNull && col(memoTs(name)).isNull

  /** Memo-backed render (same semantics as [[render]]). */
  def renderM(name: String): Column =
    when(col(memoNum(name)).isNotNull, col(memoNum(name)).cast("string"))
      .when(col(memoTs(name)).isNotNull,
        date_format(col(memoTs(name)), "yyyy-MM-dd HH:mm:ss"))
      .otherwise(col(name))

  /** isinstance(x, datetime.datetime) after convert_data_type: the cell is
    * not a number and parses under the cascade.
    */
  def isDateTime(c: Column): Column =
    !isNumber(c) && asTimestampRaw(c).isNotNull

  def asTimestamp(c: Column): Column =
    when(isDateTime(c), asTimestampRaw(c))

  def asDate(c: Column): Column = asTimestamp(c).cast(DateType)

  /** The fall-through: neither number nor datetime (includes `''`). */
  def isString(c: Column): Column = !isNumber(c) && !isDateTime(c)

  /** `x.is_integer()` on the converted float (value property, §1.2). */
  def isWholeNumber(c: Column): Column = {
    val n = asNumber(c)
    n.isNotNull && n === floor(n)
  }

  /** Render the *converted* cell the way the reference's error CSV does
    * (pandas str() of the converted value): numbers as Python floats
    * (`"05"` -> `"5.0"`), datetimes as `yyyy-MM-dd HH:mm:ss`, strings as-is.
    */
  def render(c: Column): Column =
    when(isNumber(c), asNumber(c).cast("string"))
      .when(isDateTime(c), date_format(asTimestampRaw(c), "yyyy-MM-dd HH:mm:ss"))
      .otherwise(c)
}
