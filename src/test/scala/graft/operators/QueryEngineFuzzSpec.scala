package graft.operators

import graft.SparkSpec
import graft.operators.QueryEngine.{AggregateSpec, SimpleQuery}

/** Differential fuzzing of the structured-query parity layer: random
  * SimpleQueries are executed through QueryEngine AND through an
  * independently-generated SQL translation via spark.sql — the two paths
  * share no parsing/translation code, so a mismatch means the 3-token
  * grammar, literal inference, aggregate mapping or naming diverged.
  */
class QueryEngineFuzzSpec extends SparkSpec {
  import spark.implicits._

  private lazy val table = {
    val rnd = new scala.util.Random(99)
    val cats = Array("alpha", "beta", "gamma", "delta")
    val df = (1 to 2000).map(_ =>
        (rnd.nextInt(50).toLong, cats(rnd.nextInt(4)),
          math.round(rnd.nextDouble() * 10000) / 100.0,
          rnd.nextBoolean()))
      .toDF("k", "cat", "price", "flag")
    df.createOrReplaceTempView("fuzz_t")
    df
  }

  private val numCols = Seq("k", "price")
  private val fns = Seq("count", "sum", "avg", "min", "max")

  test("random SimpleQueries agree with independent SQL translation") {
    val rnd = new scala.util.Random(7)
    (1 to 40).foreach { i =>
      val filter = rnd.nextInt(4) match {
        case 0 => None
        case 1 =>
          val op = Seq("=", ">", "<", ">=", "<=", "!=")(rnd.nextInt(6))
          Some(s"k $op ${rnd.nextInt(50)}")
        case 2 => Some(s"price ${Seq(">", "<")(rnd.nextInt(2))} " +
          s"${rnd.nextInt(100)}.5")
        case 3 => Some(s"cat = '${Seq("alpha", "beta")(rnd.nextInt(2))}'")
      }
      val groupBy = if (rnd.nextBoolean()) Seq("cat") else Nil
      val aggs = if (groupBy.nonEmpty || rnd.nextBoolean())
        (1 to 1 + rnd.nextInt(3)).map { _ =>
          val fn = fns(rnd.nextInt(fns.length))
          val c = if (fn == "count" && rnd.nextBoolean()) "*"
            else numCols(rnd.nextInt(2))
          AggregateSpec(fn, c)
        }.distinct
      else Nil
      val q = SimpleQuery("fuzz_t", filter, Nil, groupBy, aggs)

      // independent SQL rendering (no QueryEngine code)
      val whereSql = filter.map(f => s" WHERE $f").getOrElse("")
      val sql =
        if (aggs.nonEmpty) {
          val aggSql = aggs.map { a =>
            val arg = if (a.column == "*") "1" else a.column
            s"${a.function}($arg) AS `${a.outputName}`"
          }.mkString(", ")
          if (groupBy.nonEmpty)
            s"SELECT ${groupBy.mkString(", ")}, $aggSql FROM fuzz_t$whereSql " +
              s"GROUP BY ${groupBy.mkString(", ")} ORDER BY ${groupBy.mkString(", ")}"
          else s"SELECT $aggSql FROM fuzz_t$whereSql"
        } else s"SELECT * FROM fuzz_t$whereSql"

      val got = QueryEngine.run(table, q).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      val expected = spark.sql(sql).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      assert(got == expected, s"query #$i: $q\nsql: $sql")
    }
  }
}
