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
    import org.apache.spark.sql.functions.col
    if (req.filter.exists(_.trim.nonEmpty) || req.projection.nonEmpty ||
        req.aggregates.isEmpty) return None
    val eligible = req.aggregates.forall(a => a.function.toLowerCase match {
      case "count" => true
      case "min" | "max" => a.column != "*"
      case _ => false
    })
    if (!eligible) return None
    val cols = req.aggregates.filter(_.column != "*").map(_.column).distinct
    val snap = log.snapshot(req.table_name, req.version)
    val outputs = req.aggregates.map { a =>
      val src = (a.function.toLowerCase, a.column) match {
        case ("count", "*") => col("n_rows")
        case ("count", c) => col(s"cnt_$c")
        case ("min", c) => col(s"min_$c")
        case (_, c) => col(s"max_$c")
      }
      src.as(AggregateSpec(a.function, a.column, a.alias).outputName)
    }
    if (req.group_by.isEmpty)
      graft.lake.StatsAgg.fromStats(spark, snap, cols)
        .map(_.select(outputs: _*))
    else if (req.group_by == snap.schema.map(_.partCols).getOrElse(Nil))
      // GROUP BY exactly the partition columns: every file's partition
      // values live in the log, so the grouped aggregate is a grouping of
      // FileAdds — same zero-I/O answer, ordered like QueryEngine's
      // deterministic group sort
      graft.lake.StatsAgg.fromStatsByPartition(spark, snap, cols)
        .map(df => df.select(req.group_by.map(col) ++ outputs: _*)
          .orderBy(req.group_by.map(col): _*))
    else None
  }
}
