package graft.lake

import org.apache.spark.sql.types._

/** Min/max-stat file skipping for the reference's 3-token predicate grammar
  * (`<col> <op> <literal>`, `worker/src/task_executor.rs:474-516`).
  *
  * The reference collects stats in its log schema but never consults them
  * (`pkg/coordinator/query_planner.go:238-256`); this implements the
  * optimization it scaffolds. Decision rule: keep a file unless its stats
  * PROVE no row can match. Files without stats are always kept; unparseable
  * predicates prune nothing. At 100 TB this is the difference between
  * scanning a table and scanning the handful of files a point query touches —
  * same idea as parquet row-group pruning, one level up.
  */
object FilePruning {

  private val Ops = Set("=", "==", ">", "<", ">=", "<=", "!=", "<>")

  def prune(files: Seq[FileAdd], predicate: String, schema: StructType)
      : Seq[FileAdd] = {
    val parts = predicate.trim.split("\\s+", 3)
    if (parts.length != 3 || !Ops.contains(parts(1))) return files
    val colName = parts(0)
    val field = schema.fields.find(_.name == colName).getOrElse(return files)
    val lit = stripQuotes(parts(2))
    files.filter(f => mightMatch(f, colName, parts(1), lit, field.dataType))
  }

  private def stripQuotes(raw: String): String = {
    val t = raw.trim
    if (t.length >= 2 &&
        ((t.head == '\'' && t.last == '\'') || (t.head == '"' && t.last == '"')))
      t.substring(1, t.length - 1)
    else t
  }

  /** Can any row in `f` satisfy `col op lit`? Conservative: true on any
    * missing stat or parse failure.
    */
  private def mightMatch(f: FileAdd, colName: String, op: String, lit: String,
                         dt: DataType): Boolean = {
    val stats = f.stats.getOrElse(return true)
    val minS = stats.min_values.get(colName)
    val maxS = stats.max_values.get(colName)
    if (minS.isEmpty || maxS.isEmpty) return true
    val cmpMin = compare(minS.get, lit, dt).getOrElse(return true)
    val cmpMax = compare(maxS.get, lit, dt).getOrElse(return true)
    op match {
      case "=" | "==" => cmpMin <= 0 && cmpMax >= 0 // lit within [min,max]
      case "!=" | "<>" => !(cmpMin == 0 && cmpMax == 0) // not all == lit
      case ">" => cmpMax > 0
      case ">=" => cmpMax >= 0
      case "<" => cmpMin < 0
      case "<=" => cmpMin <= 0
    }
  }

  /** compare(statValue, literal) in the column's type domain; None if either
    * side fails to parse (stats are stored stringified). Date/timestamp
    * stats serialize as ISO strings, which compare correctly as strings.
    */
  private def compare(stat: String, lit: String, dt: DataType): Option[Int] =
    try dt match {
      case IntegerType | LongType =>
        // int stats, but the literal may be written as a double ("42.0")
        Some(java.lang.Double.compare(stat.toDouble, lit.toDouble))
      case FloatType | DoubleType =>
        Some(java.lang.Double.compare(stat.toDouble, lit.toDouble))
      case BooleanType =>
        Some(java.lang.Boolean.compare(stat.toBoolean, lit.toBoolean))
      case StringType | DateType | TimestampType => Some(stat.compareTo(lit))
      case _ => None
    } catch { case _: IllegalArgumentException => None }
}
