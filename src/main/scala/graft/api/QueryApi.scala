package graft.api

import com.fasterxml.jackson.databind.json.JsonMapper
import com.fasterxml.jackson.module.scala.{ClassTagExtensions, DefaultScalaModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.lake.{LakeLog, LakeTable}
import graft.operators.QueryEngine
import graft.operators.QueryEngine.{AggregateSpec, SimpleQuery}
import graft.sources.Tables

/** JSON codec + execution for the reference's structured query API — the
  * `POST /queries` body (`QueryAPIRequest`, `pkg/coordinator/rest_api.go:
  * 112-126`): `{table_name, filter?, group_by?, aggregates?[{function,
  * column, alias?}], projection?, version?}`. The HTTP transport is out of
  * scope (the driver is the control plane); the request/semantics layer is
  * exact, including snapshot-version pinning before planning
  * (`snapshot_isolation.go:288-334`).
  */
object QueryApi {

  final case class AggregateApi(function: String, column: String,
                                alias: Option[String] = None)
  final case class QueryApiRequest(table_name: String,
                                   filter: Option[String] = None,
                                   group_by: Seq[String] = Nil,
                                   aggregates: Seq[AggregateApi] = Nil,
                                   projection: Seq[String] = Nil,
                                   version: Long = 0L)

  private val mapper = JsonMapper.builder()
    .addModule(DefaultScalaModule).build() :: ClassTagExtensions

  def parse(json: String): QueryApiRequest =
    mapper.readValue[QueryApiRequest](json)

  def toSimpleQuery(r: QueryApiRequest): SimpleQuery =
    SimpleQuery(r.table_name, r.filter, r.projection, r.group_by,
      r.aggregates.map(a => AggregateSpec(a.function, a.column, a.alias)))

  /** Execute a JSON query against flat parquet tables in `dir`. */
  def run(spark: SparkSession, dir: String, json: String): DataFrame = {
    val req = parse(json)
    QueryEngine.run(Tables.load(spark, dir, req.table_name), toSimpleQuery(req))
  }

  /** Execute a JSON query against a lake table, pinned to `version`
    * (0 = latest) — the snapshot-isolated path: the file list is resolved
    * once, so concurrent commits/compactions cannot change what this query
    * reads.
    */
  def runLake(spark: SparkSession, log: LakeLog, json: String): DataFrame = {
    val req = parse(json)
    // metadata fast path first: an unfiltered, ungrouped COUNT/MIN/MAX
    // aggregate is answered from the log's footer stats with ZERO data I/O
    // (the Delta/Iceberg count(*) trick) — at 100 TB this is the
    // difference between a sub-second API response and a full-table scan.
    // Identical answers by construction (StatsAgg falls back to None for
    // any column whose stats aren't exact witnesses).
    statsFastPath(spark, log, req).getOrElse {
      // readIndexed: the request's filter (parsed to a Catalyst predicate by
      // QueryEngine) reaches LakeFileIndex, so stat-based file skipping
      // happens for the structured API too
      QueryEngine.run(
        LakeTable.readIndexed(spark, log, req.table_name, req.version),
        toSimpleQuery(req))
    }
  }

  private def statsFastPath(spark: SparkSession, log: LakeLog,
                            req: QueryApiRequest): Option[DataFrame] = {
    if (req.filter.exists(_.trim.nonEmpty) || req.group_by.nonEmpty ||
        req.projection.nonEmpty || req.aggregates.isEmpty) return None
    val eligible = req.aggregates.forall(a => a.function.toLowerCase match {
      case "count" => true
      case "min" | "max" => a.column != "*"
      case _ => false
    })
    if (!eligible) return None
    val cols = req.aggregates.filter(_.column != "*").map(_.column).distinct
    graft.lake.StatsAgg.fromStats(spark,
        log.snapshot(req.table_name, req.version), cols)
      .map(stats => stats.select(req.aggregates.map { a =>
        val src = (a.function.toLowerCase, a.column) match {
          case ("count", "*") => org.apache.spark.sql.functions.col("n_rows")
          case ("count", c) => org.apache.spark.sql.functions.col(s"cnt_$c")
          case ("min", c) => org.apache.spark.sql.functions.col(s"min_$c")
          case (_, c) => org.apache.spark.sql.functions.col(s"max_$c")
        }
        src.as(AggregateSpec(a.function, a.column, a.alias).outputName)
      }: _*))
  }
}
