package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B experiment readout — the two-proportion z-test (the standard
  * conversion-rate significance check) in EXACT arithmetic: the usual
  * z = (p₁−p₂)/√(p̂(1−p̂)(1/n₁+1/n₂)) needs a square root, so instead the
  * SQUARED inequality cross-multiplies into one integer comparison
  *
  *   den · N · (x₁n₂ − x₂n₁)²  >  num · x(N−x) · n₁n₂
  *
  * (strict: when both arms convert identically — including the
  * degenerate all-or-none pools where the pooled variance is zero —
  * both sides are 0 and the verdict is NOT significant, matching the
  * undefined-z convention.)
  *
  * with z²_crit = num/den as an exact rational (3.8416 = 9604/2500 for
  * α = 0.05 two-sided). Products reach ~(xn)²·N, past int64 at real
  * user counts — they evaluate in DECIMAL(38,0), which Spark and DuckDB
  * both compute exactly (the new member of the integer-envelope recipe
  * family: when the ×1e6-scaling envelope runs out, widen to decimal,
  * never to floats).
  *
  * Scale shape: one per-user aggregate (map-side combine over the raw
  * event stream), one per-variant count — the comparison runs on TWO
  * rows. Nothing downstream of the first aggregate scales with data.
  */
object AbTest {

  /** Per-variant conversion counts + the significance verdict. `events`
    * needs (userCol, variant via hash provided by caller as a column
    * name, convCol boolean-ish 0/1 per event). Returns one row:
    * (n_a, x_a, n_b, x_b, lift_ppm, significant). */
  def twoProportion(events: DataFrame, userCol: String, variantCol: String,
                    convCol: String, zSqNum: Long = 9604L,
                    zSqDen: Long = 2500L): DataFrame = {
    val perUser = events.groupBy(col(userCol), col(variantCol))
      .agg(max(col(convCol)).cast("long").as("converted"))
    val perVariant = perUser.groupBy(col(variantCol))
      .agg(count(lit(1)).as("n"), sum("converted").as("x"))
    val a = perVariant.filter(col(variantCol) === 0)
      .select(col("n").as("n_a"), col("x").as("x_a"))
    val b = perVariant.filter(col(variantCol) === 1)
      .select(col("n").as("n_b"), col("x").as("x_b"))
    // every product evaluates in DECIMAL — a bigint intermediate would
    // overflow under ANSI before the cast. Envelope: exact while
    // den·N·(xn)² < 10³⁸, i.e. up to ~10⁹ users per arm — beyond that,
    // downsample the readout (the verdict is asymptotically saturated
    // anyway at those n)
    a.crossJoin(b) // 1×1 — two scalar rows meeting, not a data join
      .withColumn("diff", expr(
        """CAST(x_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0)) -
           CAST(x_b AS DECIMAL(19,0)) * CAST(n_a AS DECIMAL(19,0))"""))
      .withColumn("lift_ppm",
        expr("x_b * 1000000L div n_b - x_a * 1000000L div n_a"))
      .withColumn("significant", expr(
        s"""CAST(CASE WHEN
             CAST($zSqDen AS DECIMAL(19,0)) *
             CAST(n_a + n_b AS DECIMAL(19,0)) * diff * diff >
             CAST($zSqNum AS DECIMAL(19,0)) *
             CAST(x_a + x_b AS DECIMAL(19,0)) *
             CAST(n_a + n_b - x_a - x_b AS DECIMAL(19,0)) *
             CAST(n_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))
           THEN 1 ELSE 0 END AS INT)"""))
      .drop("diff")
  }
}
