package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join with token blocking.
  *
  * Entity-resolution building block the reference approximates with its
  * tokenized secondary index (reference: examples/example-secondary-index/
  * .../ESecondaryIndex.scala:109-125 — words as index keys, exact lookup):
  * here the token index generates CANDIDATE pairs, and an exact Levenshtein
  * filter keeps real near-matches. All-pairs edit distance is quadratic;
  * token blocking reduces it to pairs sharing ≥1 token, and the
  * `maxTokenDf` cap drops stop-word-like tokens whose blocks would explode
  * (the standard frequency-capped blocking from the set-similarity-join
  * literature — at corpus scale the cap is what bounds the worst block).
  *
  * Levenshtein is evaluated once per DISTINCT candidate pair (pairs sharing
  * several tokens dedup before the distance), with Spark's codegen'd
  * `levenshtein` — semantics identical to DuckDB's `levenshtein`, so results
  * oracle exactly.
  */
object FuzzyJoin {

  /** Pairs of rows whose `strCol` values are within `maxDistance` edits,
    * canonicalized `id_a < id_b`. Tokens = space-split of `strCol`; tokens
    * appearing in more than `maxTokenDf` rows generate no candidates. */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDistance: Int,
      maxTokenDf: Long = Long.MaxValue): DataFrame = {
    val toks = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("tok", explode(array_distinct(split(col("s"), " "))))
    val keptTokens = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxTokenDf)
      .select("tok")
    val blocked = toks.join(keptTokens, "tok")
    val a = blocked.select(col("tok"), col("id").as("id_a"), col("s").as("s_a"))
    val b = blocked.select(col("tok"), col("id").as("id_b"), col("s").as("s_b"))
    a.join(b, "tok")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "s_a", "s_b")
      .distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDistance)
  }
}
