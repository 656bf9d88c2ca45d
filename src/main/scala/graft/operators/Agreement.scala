package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the labeled-data QA gate a training
  * pipeline runs before trusting human (or model-as-judge) labels:
  * Cohen's kappa per group, chance-corrected so "both said the majority
  * class" doesn't masquerade as consensus.
  *
  * Exactness: kappa has an exact integer form. With N items, `agree` =
  * Σ_c n_cc diagonal matches and S = Σ_c a_c·b_c the marginal products,
  *
  *   kappa = (p_o − p_e) / (1 − p_e) = (N·agree − S) / (N² − S)
  *
  * — a ratio of integers, no probabilities materialized. `kappa_ppm`
  * floors 10⁶ × that ratio with the sign-safe floor idiom
  * `(num − (((num % den) + den) % den)) div den` (kappa is negative for
  * worse-than-chance annotators, and Spark's `div`/`%` truncate while
  * engines differ on negative floor division — the idiom is floor under
  * truncating `%` in both Spark and DuckDB, the same move the
  * fixed-point Lloyd oracle uses for floor-means). Degenerate p_e = 1
  * (both annotators constant): 10⁶ when they agree, 0 otherwise.
  *
  * Scale shape: two (group, class) marginal aggregates + one
  * (group, class)-keyed join + one group-keyed join — every exchange is
  * O(groups × classes), never item-shaped past the first aggregate.
  * Overflow bound: 10⁶·N² must stay under 2⁶³ → per-group N ≤ ~3·10⁶;
  * beyond that, pre-aggregate the confusion matrix per group and run
  * the same formula over its counts.
  */
object Agreement {

  /** Per-group Cohen's kappa over two integer label columns. Returns
    * (groupCol, n, agree, kappa_ppm).
    *
    * NOTE (caching contract): the (group, a, b) confusion cube — the ONE
    * row-shaped aggregate — is persisted, because three downstream
    * aggregates consume it and would otherwise each re-scan the input
    * and re-run the per-row labeling; its O(groups × classes²) rows stay
    * cached post-materialization (Verify/Bench clearCache per query). */
  def cohenKappaBy(labels: DataFrame, groupCol: String, aCol: String,
                   bCol: String): DataFrame = {
    val cube = labels.select(col(groupCol).as("__g"),
        col(aCol).cast("long").as("__a"), col(bCol).cast("long").as("__b"))
      .groupBy("__g", "__a", "__b").agg(count(lit(1)).as("c"))
      .persist()
    val agg = cube.groupBy("__g").agg(sum("c").as("n"),
      sum(when(col("__a") === col("__b"), col("c")).otherwise(0L))
        .as("agree"))
    val ma = cube.groupBy(col("__g"), col("__a").as("cls"))
      .agg(sum("c").as("na"))
    val mb = cube.groupBy(col("__g"), col("__b").as("cls"))
      .agg(sum("c").as("nb"))
    // inner join on class: a class absent from either marginal
    // contributes 0 to S — and a group whose annotators use fully
    // DISJOINT classes has no surviving row at all (S = 0, p_e = 0), so
    // the group-level join below must be LEFT + coalesce, not inner
    val s = ma.join(mb, Seq("__g", "cls"))
      .groupBy("__g").agg(sum(col("na") * col("nb")).as("s"))
    agg.join(s, Seq("__g"), "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
      .withColumn("num", expr("1000000 * (n * agree - s)"))
      .withColumn("den", expr("n * n - s"))
      .select(col("__g").as(groupCol), col("n"), col("agree"),
        when(col("den") === 0,
          when(col("agree") === col("n"), lit(1000000L)).otherwise(lit(0L)))
          .otherwise(
            expr("(num - (((num % den) + den) % den)) div den"))
          .cast("long").as("kappa_ppm"))
  }
}
