package graft.io

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** ICD-10 code catalog for check_icd10 (F9). The vendored reference library
  * keys a ~44k-entry JSON dict of code -> description, gzip-compressed, and
  * looks codes up with the dot stripped (`icd10/__init__.py:98-107`).
  *
  * The codes file is not shipped here; [[load]] reads that exact format
  * from any path the caller provides. [[existsFn]] broadcasts the code set
  * and returns the engine's membership Column function — dot-stripping
  * replicated, `exists("") == false` implied by set membership.
  */
object IcdCatalog {

  /** Parse a gzip JSON dict (code -> description) into the code set. */
  def load(path: String): Set[String] = {
    val in = new java.util.zip.GZIPInputStream(
      java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path)))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    // minimal JSON-object key scan: keys are bare code strings, values are
    // description strings — no nesting in the format
    val key = """"((?:[^"\\]|\\.)*)"\s*:""".r
    key.findAllMatchIn(text).map(_.group(1)).toSet
  }

  /** Membership Column fn over a broadcast set, dot stripped before lookup. */
  def existsFn(spark: SparkSession, codes: Set[String]): Column => Column = {
    val bc = spark.sparkContext.broadcast(codes)
    val exists = udf((s: String) => s != null && bc.value.contains(s.replace(".", "")))
    c => exists(c)
  }

  /** Small-catalog variant: pure `isin` expression, no UDF — preferable
    * when the catalog fits a literal list (tests, subsets).
    */
  def existsFnSmall(codes: Set[String]): Column => Column =
    c => regexp_replace(c, "\\.", "").isin(codes.toSeq: _*)
}
