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
    // readIndexed: the request's filter (parsed to a Catalyst predicate by
    // QueryEngine) reaches LakeFileIndex, so stat-based file skipping
    // happens for the structured API too
    QueryEngine.run(
      LakeTable.readIndexed(spark, log, req.table_name, req.version),
      toSimpleQuery(req))
  }
}
