package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy matching — the record-linkage primitive for short
  * keys (titles, names, URLs): all pairs within Levenshtein distance
  * `maxDist`, found without the O(n²) cross join. The reference engine
  * has no fuzzy-match surface; judged pipeline extension alongside the
  * token-level dedup family in [[Dedup]] (Jaccard/minhash cover long
  * documents; edit distance covers short near-identical keys where a
  * one-character typo defeats token shingles).
  *
  * Algorithm (Gravano et al., VLDB'01 approximate string joins):
  * candidates via POSITIONAL q-GRAM count filtering — two strings within
  * edit distance d share at least max(|s1|,|s2|)−q+1−q·d positional
  * q-grams (each edit destroys ≤ q grams), and matching grams sit within
  * d positions of each other — then an exact `levenshtein` verify on the
  * survivors. Both filters only ever ADMIT a superset, so the verify step
  * makes the result exact; the DuckDB oracle recomputes it as the
  * length-banded quadratic join (feasible at oracle scale only).
  *
  * Scale shape: the gram self-join is the inverted-index shuffle — rows
  * are (gram, pos, id, len) scalars, text never moves; candidate pairs
  * (not the corpus) flow into the groupBy count filter; the verify joins
  * keys back for ≤ candidate rows. Strings too short for the count filter
  * (threshold ≤ 0) route through an exact length-band join instead:
  * each short string explodes its 2d+1 admissible partner lengths, so
  * the block is |short| × (per-length partners), never all-pairs.
  */
object EditDist {

  /** All pairs (id_1, id_2, dist) with levenshtein(key1, key2) ≤ maxDist,
    * id_1 < id_2. `df` must carry one row per id with a short string
    * `keyCol` (callers derive it — e.g. a normalized title or prefix). */
  def editDistancePairs(df: DataFrame, maxDist: Int, q: Int = 3,
                        idCol: String = "doc_id",
                        keyCol: String = "key"): DataFrame = {
    require(maxDist >= 0 && q >= 2)
    val d = maxDist
    val base = df.select(col(idCol).cast("long").as("id"),
        col(keyCol).as("k"))
      .withColumn("len", length(col("k")))
    // count-filter threshold for a pair is max(len1,len2)−q+1−q·d > 0;
    // a string can only be in such a pair if its OWN threshold is
    // positive (max ≥ own len). Everything below routes to the band join.
    val minLen = q + q * d // len−q+1−q·d ≥ 1  ⇔  len ≥ q+q·d
    val long = base.filter(col("len") >= minLen)
    val short = base.filter(col("len") < minLen)

    // positional grams of the long side; join on (gram), prune by
    // position and length windows, then the count filter
    val grams = long
      .select(col("id"), col("len"), col("k"),
        posexplode(expr(s"transform(sequence(1, len - ${q - 1}), " +
          s"p -> substring(k, p, $q))")))
      .select(col("id"), col("len"), col("pos"), col("col").as("gram"))
    // Position-bucketed equi-key beside the gram: |Δpos| ≤ d means the
    // partner's bucket (width d+1) is within ±1 of ours, so one side
    // claims its 3 adjacent buckets and the join key becomes (gram,
    // bucket) — a hot gram's fan-out drops from (its occurrences)² to
    // per-bucket-window pairs, while the exact |Δpos| filter below keeps
    // the candidate set identical. Each qualifying occurrence pair still
    // matches exactly once (the partner's own bucket appears once among
    // the 3 claims).
    val bw = d + 1
    val g2 = grams.withColumn("pb", floor(col("pos") / bw))
    val g1 = grams
      .withColumn("pb0", floor(col("pos") / bw))
      .withColumn("pb", explode(array(col("pb0") - 1, col("pb0"),
        col("pb0") + 1)))
      .drop("pb0")
    val cand = g1.as("g1").join(g2.as("g2"),
        col("g1.gram") === col("g2.gram") &&
          col("g1.pb") === col("g2.pb") &&
          col("g1.id") < col("g2.id") &&
          abs(col("g1.pos") - col("g2.pos")) <= d &&
          abs(col("g1.len") - col("g2.len")) <= d)
      .groupBy(col("g1.id").as("id_1"), col("g2.id").as("id_2"),
        col("g1.len").as("len1"), col("g2.len").as("len2"))
      .agg(count(lit(1)).as("m"))
      .filter(col("m") >=
        greatest(col("len1"), col("len2")) - lit(q - 1) - lit(q * d))
      .select("id_1", "id_2")

    // short strings: exact length-band join — partner length must be in
    // [len−d, len+d], so explode those 2d+1 lengths and equi-join against
    // the WHOLE key table (short–short pairs land twice, short–long once;
    // least/greatest + distinct canonicalizes either way)
    val shortCand = short
      .select(col("id"), col("len"),
        explode(sequence(col("len") - d, col("len") + d)).as("plen"))
      .as("s").join(base.as("o"),
        col("o.len") === col("s.plen") && col("s.id") =!= col("o.id"))
      .select(least(col("s.id"), col("o.id")).as("id_1"),
        greatest(col("s.id"), col("o.id")).as("id_2"))

    // verify survivors with the exact distance; join keys back
    // (candidate-sized joins, the corpus-wide key table is the build side)
    val pairs = cand.union(shortCand).distinct()
    pairs
      .join(base.select(col("id").as("id_1"), col("k").as("k1"),
        col("len").as("l1")), "id_1")
      .join(base.select(col("id").as("id_2"), col("k").as("k2"),
        col("len").as("l2")), "id_2")
      .filter(abs(col("l1") - col("l2")) <= d)
      .withColumn("dist", levenshtein(col("k1"), col("k2")))
      .filter(col("dist") <= d)
      .select(col("id_1"), col("id_2"), col("dist"))
  }
}
