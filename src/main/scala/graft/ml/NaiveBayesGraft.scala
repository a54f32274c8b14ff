package graft.ml

import graft.Tables
import graft.functions.TextFns.tokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the classic linear-time
  * quality/language classifier an LLM-data pipeline trains over hashed
  * or raw token counts (the reference's classifier surface — CSVM, RF,
  * KNN `dislib/classification/` — has no text-native member; this is
  * the extension that covers fastText-style corpus labeling on Spark).
  *
  * All model parameters are ROUNDED to integer micro-nats
  * (round(ln(p)·10⁶)) the moment they are computed, so document scores
  * are SUMS OF INTEGERS — associative, partition-order-free, and
  * bit-replayable in the DuckDB oracle, the same pinning discipline as
  * the unrolled KMeans/GMM gates. Laplace +1 smoothing over the train
  * vocabulary; out-of-vocabulary test tokens are skipped (standard
  * multinomial NB semantics); ties break on class name ascending.
  *
  * Scale: training is ONE (class, word) groupBy over the token stream —
  * partial counts combine map-side, state is vocab-bounded (Heaps' law:
  * sublinear in corpus size). The vocab×class log-prob grid joins the
  * test token stream by word — AQE broadcasts it while it fits, falls
  * back to a shuffle join beyond, never a crossJoin against data.
  * Scoring partial-aggregates (doc, class) sums map-side; the argmax
  * runs on the |docs|×|classes| score frame with a per-doc top-1
  * WindowGroupLimit. Nothing is driver-side; no iteration (closed-form
  * MLE), so the whole fit+predict is one declarative plan.
  */
object NaiveBayesGraft {

  /** Micro-nat scale for rounded log-probabilities. */
  val Scale = 1000000L

  /** Train on even doc_ids / predict odd doc_ids, lang as the label;
    * emit the (true lang × predicted) confusion matrix. */
  def query(spark: SparkSession, dir: String): DataFrame =
    confusion(Tables.documents(spark, dir)
      .withColumn("is_train", col("doc_id") % 2 === 0))

  /** Core over any (doc_id, lang, text, is_train) frame. */
  def confusion(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("lang"), col("is_train"),
        explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val train = toks.filter(col("is_train"))

    val classTotals = train.groupBy("lang")
      .agg(count(lit(1)).as("n_c"))
    val vocabSize = train.agg(countDistinct(col("w")).as("v"))
    val wordCounts = train.groupBy("lang", "w")
      .agg(count(lit(1)).as("c_wc"))

    // vocab × class grid with Laplace +1: lp = round(ln((c+1)/(N_c+V))·1e6)
    val grid = train.select("w").distinct()
      .crossJoin(broadcast(classTotals))
      .join(wordCounts, Seq("lang", "w"), "left")
      .na.fill(0L, Seq("c_wc"))
      .crossJoin(broadcast(vocabSize))
      .select(col("w"), col("lang"),
        round(log((col("c_wc") + 1).cast("double") / (col("n_c") + col("v")).cast("double"))
          * Scale).cast("long").as("lp"))

    // priors from train document counts, same micro-nat rounding
    val trainDocs = docs.filter(col("is_train"))
    val priors = trainDocs.groupBy("lang").agg(count(lit(1)).as("n_docs_c"))
      .crossJoin(broadcast(trainDocs.agg(count(lit(1)).as("n_docs"))))
      .select(col("lang"),
        round(log(col("n_docs_c").cast("double") / col("n_docs").cast("double"))
          * Scale).cast("long").as("lp0"))

    val tokenScores = toks.filter(!col("is_train"))
      .select(col("doc_id"), col("w"))
      .join(grid, "w") // one row per (token, class)
      .groupBy(col("doc_id"), col("lang").as("cls"))
      .agg(sum("lp").as("sum_lp"))

    val scored = docs.filter(!col("is_train"))
      .select(col("doc_id"), col("lang"))
      .crossJoin(broadcast(priors.select(col("lang").as("cls"), col("lp0"))))
      .join(tokenScores, Seq("doc_id", "cls"), "left")
      .select(col("doc_id"), col("lang"), col("cls"),
        (col("lp0") + coalesce(col("sum_lp"), lit(0L))).as("score"))

    val pred = scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), asc("cls"))))
      .filter(col("rk") === 1)

    pred.groupBy(col("lang"), col("cls").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "pred_lang")
  }

  private val wordsSql = "regexp_split_to_array(trim(text), '\\s+')"

  val oracle: String =
    s"""WITH d AS (SELECT doc_id, lang, text, doc_id % 2 = 0 AS is_train
       |    FROM documents),
       |toks AS (SELECT doc_id, lang, is_train, w
       |  FROM (SELECT doc_id, lang, is_train, unnest($wordsSql) AS w FROM d)
       |  WHERE len(w) > 0),
       |train AS (SELECT * FROM toks WHERE is_train),
       |ct AS (SELECT lang, count(*)::BIGINT AS n_c FROM train GROUP BY lang),
       |vs AS (SELECT count(DISTINCT w)::BIGINT AS v FROM train),
       |wc AS (SELECT lang, w, count(*)::BIGINT AS c_wc FROM train
       |  GROUP BY lang, w),
       |grid AS (SELECT vw.w, ct.lang,
       |    round(ln((coalesce(c_wc, 0) + 1)::DOUBLE / (n_c + v)::DOUBLE)
       |      * $Scale)::BIGINT AS lp
       |  FROM (SELECT DISTINCT w FROM train) vw
       |  CROSS JOIN ct
       |  LEFT JOIN wc ON wc.lang = ct.lang AND wc.w = vw.w
       |  CROSS JOIN vs),
       |td AS (SELECT lang, count(*)::BIGINT AS n_docs_c FROM d
       |  WHERE is_train GROUP BY lang),
       |tt AS (SELECT count(*)::BIGINT AS n_docs FROM d WHERE is_train),
       |priors AS (SELECT lang AS cls,
       |    round(ln(n_docs_c::DOUBLE / n_docs::DOUBLE) * $Scale)::BIGINT AS lp0
       |  FROM td CROSS JOIN tt),
       |ts AS (SELECT doc_id, grid.lang AS cls, sum(lp)::BIGINT AS sum_lp
       |  FROM (SELECT doc_id, w FROM toks WHERE NOT is_train) t
       |  JOIN grid ON grid.w = t.w
       |  GROUP BY doc_id, grid.lang),
       |scored AS (SELECT d.doc_id, d.lang, priors.cls,
       |    lp0 + coalesce(sum_lp, 0) AS score
       |  FROM d CROSS JOIN priors
       |  LEFT JOIN ts ON ts.doc_id = d.doc_id AND ts.cls = priors.cls
       |  WHERE NOT d.is_train),
       |pred AS (SELECT lang, cls FROM (SELECT lang, cls,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, cls) AS rk
       |  FROM scored) WHERE rk = 1)
       |SELECT lang, cls AS pred_lang, count(*)::BIGINT AS n_docs
       |FROM pred GROUP BY lang, cls ORDER BY lang, pred_lang""".stripMargin
}
