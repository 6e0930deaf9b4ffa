package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus TF-IDF top terms — the standard "what is this page about"
  * signal a training-data pipeline derives before topic filtering.
  *
  * Scale shape:
  *  - TF is computed INSIDE the row ([[WebClean.word_counts]]): the
  *    exploded stream carries each (doc, word) pair exactly once, so
  *    the DF aggregation is ONE word-keyed shuffle with map-side
  *    combine (a naive tokenize->explode->groupBy(doc,word) shape
  *    shuffles every token occurrence);
  *  - the DF table (vocabulary-sized, orders of magnitude smaller than
  *    the corpus) joins back on the word key; the per-doc top-k window
  *    shuffles by doc id — both inherent to corpus-weighted scoring;
  *  - N (corpus size) enters the plan as a broadcast scalar aggregate,
  *    not a driver-side count action.
  *
  * Scoring is INTEGER-exact so driver oracles compare bit-for-bit:
  * score = tf * floor(scale * N / df) — the floor of an IEEE-double
  * division both engines compute identically — instead of a float
  * tf*ln(N/df) whose ulp noise could flip near-tied ranks between
  * engines. Ties break by word ascending.
  */
object TfIdf {

  /** Top `k` terms per document: (idCol, word, tf, df, rank). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int,
      scale: Long = 1000000L): DataFrame = {
    val words = docs.select(col(idCol),
        explode(WebClean.word_counts(col(textCol))).as("__wc__"))
      .select(col(idCol), col("__wc__.word").as("word"),
        col("__wc__.tf").as("tf"))
    val df = words.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n__"))
    val scored = words.join(df, "word")
      .crossJoin(broadcast(n))
      .withColumn("__score__", col("tf") *
        floor(lit(scale.toDouble) * col("__n__") / col("df")).cast("long"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__score__").desc, col("word"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("word"), col("tf"), col("df"), col("rank"))
  }
}
