package graft

import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => asize}

/** Pins the native DropTokensAt rebuild (r16 span-trim tail) against the
  * old declarative form: posexplode(split) → anti-join dropped (doc, p) →
  * collect_list/array_sort/transform/array_join rollup. Covers double
  * spaces (empty tokens kept by the single-space split), leading/trailing
  * spaces, all-dropped, none-dropped, and out-of-order drop input (the
  * operator sorts; the native requires sorted). */
class TrimNativeSpec extends SparkSpec {
  import spark.implicits._

  private val cases: Seq[(Long, String, Seq[Int])] = Seq(
    (1L, "one two three four", Seq(1, 2)),
    (2L, "a  b   c", Seq(0)),            // empty tokens at p=1, 3, 4
    (3L, " lead and trail ", Seq(2)),    // empties at p=0 and p=4
    (4L, "x y z", Seq(0, 1, 2)),         // all dropped → ""
    (5L, "solo", Seq()),                 // none dropped → identity
    (6L, "p q r s t", Seq(4, 0)))        // dropped set arrives unsorted

  "DropTokensAt" should "equal the explode/anti-join/collect_list rollup" in {
    val docs = cases.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val dropped = cases.flatMap { case (id, _, ps) => ps.map(p => (id, p)) }
      .toDF("doc_id", "p")
    // old declarative spelling (the pre-r16 trim tail)
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("p", "tok")))
    val oldKept = toks.join(dropped, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_tokens"),
        array_join(expr("transform(array_sort(collect_list(struct(p, tok))), x -> x.tok)"), " ")
          .as("trimmed_text"))
    val old = docs.join(oldKept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept"),
        coalesce(col("trimmed_text"), lit("")).as("trimmed"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // native spelling (sorted positions, like the operator's sort_array)
    val sets = dropped.groupBy("doc_id")
      .agg(sort_array(collect_set(col("p"))).as("drop_ps"))
    val nw = docs.join(sets, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(
          asize(split(col("text"), " ")).cast("long") -
            coalesce(asize(col("drop_ps")), lit(0)).cast("long"),
          lit(0L)).as("kept"),
        coalesce(
          when(col("drop_ps").isNull, col("text"))
            .otherwise(dropTokensAt(col("text"), col("drop_ps"))),
          lit("")).as("trimmed"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    nw shouldBe old
    // identity spot-checks
    val m = nw.map(x => x._1 -> x._3).toMap
    m(5L) shouldBe "solo"
    m(4L) shouldBe ""
    m(2L) shouldBe " b   c" // p=0 'a' dropped; empties keep their slots
  }
}
