package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction over a word-frequency table —
  * the tokenizer-training step of an LLM data pipeline (Sennrich et al.
  * 2016's algorithm, the basis of GPT/Llama tokenizers; the reference
  * has no tokenizer surface, this is an engine extension like Packing).
  *
  * Each round counts adjacent token pairs corpus-wide (weighted by word
  * frequency), merges the most frequent pair everywhere, and repeats.
  * The greedy left-to-right merge has a closed form both engines compute
  * identically with window functions — no per-word loop:
  *
  *  - for a merge pair (a,b) with a ≠ b, matches can never overlap (an
  *    overlap would need the shared token to equal both a and b), so
  *    every match position merges;
  *  - for a == b, matches chain only inside maximal runs of consecutive
  *    `a` tokens, where greedy semantics merge at odd offsets
  *    (1st, 3rd, …) of the run — the classic gaps-and-islands rank.
  *
  * Scale shape: all windows partition by WORD (bounded short frames, no
  * skew), the pair count is one hash aggregate per round, and only the
  * 1-row argmax reaches the driver per round (the [[graft.scoring.Boosting]]
  * model-state convention). Token tables localCheckpoint per round so
  * the plan stays flat across rounds. At open-corpus scale the caller
  * bounds the word table first (frequency cutoff — the standard BPE
  * practice) rather than this operator collecting anything.
  *
  * Determinism: counts are exact longs, merges are string equality, the
  * argmax ties break on (count desc, left, right) — no floats anywhere,
  * so a DuckDB oracle replaying the rounds lands on the same vocabulary.
  */
object Bpe {

  /** One merge round: the chosen pair, its corpus-wide weighted count at
    * selection time, and the distinct-token vocabulary size after the
    * merge is applied.
    */
  final case class Merge(round: Int, left: String, right: String,
      count: Long, vocabAfter: Long)

  /** Run `rounds` merge rounds over `words` (one row per distinct word
    * with its corpus frequency). Words split into single characters at
    * round 0 (no end-of-word marker — documented simplification).
    */
  def fit(words: DataFrame, wordCol: Column, freqCol: Column,
      rounds: Int): Seq[Merge] = fitWithTokens(words, wordCol, freqCol, rounds)._1

  /** [[fit]] plus the post-merge token table `(word, freq, pos, tok)` —
    * the ENCODER side: joining it back to per-slice word frequencies
    * prices the learned vocabulary on any slice without re-running the
    * merge chain at corpus scale (q189).
    */
  def fitWithTokens(words: DataFrame, wordCol: Column, freqCol: Column,
      rounds: Int): (Seq[Merge], DataFrame) = {
    require(rounds >= 1, s"Bpe.fit: rounds must be >= 1, got $rounds")
    var toks = words
      .select(wordCol.as("word"), freqCol.cast("long").as("freq"))
      .withColumn("pos", explode(sequence(lit(1), length(col("word")))))
      .select(col("word"), col("freq"), col("pos"),
        expr("substring(word, pos, 1)").as("tok"))
      .localCheckpoint()
    val out = Seq.newBuilder[Merge]
    for (t <- 1 to rounds) {
      val byPos = Window.partitionBy(col("word")).orderBy(col("pos"))
      val p = toks.withColumn("rn", row_number().over(byPos))
        .withColumn("nxt", lead(col("tok"), 1).over(byPos))
      val bestRow = p.where(col("nxt").isNotNull)
        .groupBy(col("tok"), col("nxt")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"), col("nxt")).limit(1).head()
      val (a, b, cnt) = (bestRow.getString(0), bestRow.getString(1),
        bestRow.getLong(2))
      // gaps-and-islands rank among consecutive `a` tokens (only
      // consulted when a == b, but computed uniformly so the oracle SQL
      // is one static shape)
      val isA = (col("tok") === a).cast("int")
      val arn = row_number().over(
        Window.partitionBy(col("word"), isA).orderBy(col("rn")))
      val q = p.withColumn("mt", col("tok") === a && col("nxt") === b)
        .withColumn("arn", arn)
      val off = row_number().over(Window
        .partitionBy(col("word"), isA, col("rn") - col("arn"))
        .orderBy(col("rn")))
      val r = q.withColumn("ms",
        col("mt") && (lit(a != b) || off % 2 === 1))
      val byRn = Window.partitionBy(col("word")).orderBy(col("rn"))
      val merged = r.withColumn("pms", lag(col("ms"), 1).over(byRn))
        .where(!coalesce(col("pms"), lit(false)))
        .select(col("word"), col("freq"), col("pos"),
          when(col("ms"), lit(a + b)).otherwise(col("tok")).as("tok"))
        .localCheckpoint()
      val vocab = merged.agg(countDistinct(col("tok"))).head().getLong(0)
      out += Merge(t, a, b, cnt, vocab)
      toks = merged
    }
    (out.result(), toks)
  }
}
