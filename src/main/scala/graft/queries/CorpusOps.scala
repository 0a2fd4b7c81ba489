package graft.queries

import graft.Tables
import graft.operators.{Chunking, Funnel, Terms}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-4 corpus-preparation and event-analytics queries: token-window
 * chunking, cross-document segment dedup (C4-style line dedup),
 * TF-IDF-ranked distinctive terms, collocation mining, ordered funnels
 * and cohort retention. Every query carries a full DuckDB oracle —
 * the rankings are deliberately all-integer (see Terms) so no float
 * tolerance is needed anywhere.
 */
object CorpusOps {

  private val ChunkSize = 30
  private val ChunkStride = 20
  private val SegLen = 10
  private val FunnelWithinUs = 12L * 3600 * 1000000 // 12 h per step
  private val DayUs = 86400000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Sliding token-window chunking: 30-token chunks every 20 tokens.
    "text_chunk" -> { (spark, dir) =>
      Chunking.chunk(Tables.load(spark, dir, "documents"),
        "doc_id", "text", ChunkSize, ChunkStride)
        .orderBy("doc_id", "chunk_id")
    },

    // Cross-document segment dedup: each distinct 10-token segment
    // survives only at its first (doc_id, seg_idx) occurrence.
    "text_seg_dedup" -> { (spark, dir) =>
      Chunking.segmentDedup(Tables.load(spark, dir, "documents"),
        "doc_id", "text", SegLen)
        .orderBy("doc_id")
    },

    // Top-3 distinctive terms per doc, all-integer TF-IDF ranking.
    "text_distinctive" -> { (spark, dir) =>
      Terms.distinctiveTerms(Tables.load(spark, dir, "documents"),
        "doc_id", "text", 3)
        .orderBy("doc_id", "rank")
    },

    // Corpus top-20 adjacent-token bigrams (collocations).
    "q_top_bigrams" -> { (spark, dir) =>
      Terms.topBigrams(Tables.load(spark, dir, "documents"), "text", 20)
    },

    // Ordered funnel view → click → purchase, 12 h per-step deadline.
    "q_events_funnel" -> { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      Funnel.funnel(ev, "user_id", "us", "event_id", "event_type",
        Seq("view", "click", "purchase"), FunnelWithinUs)
        .orderBy("stage")
    },

    // Daily signup-cohort retention triangle, offsets 0..7.
    "q_events_retention" -> { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
      Funnel.retention(ev, "user_id", "us", "event_type", "signup",
        DayUs, 7)
        .select(col("cohort"), col("offset").as("offset_d"), col("n_users"))
        .orderBy("cohort", "offset_d")
    }
  )

  private val toks =
    raw"list_filter(string_split_regex(text,'\s+'), x -> len(x)>0)"

  val oracleSql: Map[String, String] = Map(

    "text_chunk" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |i AS (SELECT doc_id, toks,
         |  unnest(range(0, CAST(floor((len(toks)-1)/$ChunkStride) AS BIGINT) + 1)) AS chunk_id
         |  FROM t WHERE len(toks) > 0),
         |c AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  list_slice(toks, chunk_id*$ChunkStride+1,
         |             least(chunk_id*$ChunkStride+$ChunkSize, len(toks))) AS ctoks
         |  FROM i)
         |SELECT doc_id, chunk_id, CAST(len(ctoks) AS BIGINT) AS n_tok,
         |  array_to_string(ctoks, ' ') AS chunk
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "text_seg_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |i AS (SELECT doc_id, toks,
         |  unnest(range(0, CAST(floor((len(toks)-1)/$SegLen) AS BIGINT) + 1)) AS seg_idx
         |  FROM t WHERE len(toks) > 0),
         |segs AS (SELECT doc_id, CAST(seg_idx AS BIGINT) AS seg_idx,
         |  array_to_string(list_slice(toks, seg_idx*$SegLen+1,
         |    least(seg_idx*$SegLen+$SegLen, len(toks))), ' ') AS seg
         |  FROM i),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seg_total
         |        FROM segs GROUP BY 1),
         |k AS (SELECT doc_id, seg_idx, seg,
         |  row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
         |  FROM segs)
         |SELECT k.doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text,
         |  CAST(count(*) AS BIGINT) AS n_seg_kept, tot.n_seg_total AS n_seg_total
         |FROM k JOIN tot USING (doc_id) WHERE rn = 1
         |GROUP BY k.doc_id, tot.n_seg_total ORDER BY doc_id""".stripMargin,

    "text_distinctive" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |       FROM tok GROUP BY 1, 2),
         |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |ranked AS (SELECT doc_id, token, tf.tf, df.df,
         |  row_number() OVER (PARTITION BY doc_id
         |                     ORDER BY tf.tf DESC, df.df ASC, token ASC) AS rank
         |  FROM tf JOIN df USING (token))
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, tf, df
         |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q_top_bigrams" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |bg AS (SELECT unnest(list_transform(range(1, len(toks)),
         |         i -> toks[i] || ' ' || toks[i+1])) AS bigram
         |       FROM t WHERE len(toks) >= 2)
         |SELECT bigram, CAST(count(*) AS BIGINT) AS n
         |FROM bg GROUP BY 1 ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin,

    "q_events_funnel" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
         |  FROM events WHERE event_type IN ('view','click','purchase')),
         |w0 AS (SELECT *, min(CASE WHEN event_type='view' THEN us END)
         |  OVER (PARTITION BY user_id ORDER BY us, event_id
         |        ROWS UNBOUNDED PRECEDING) AS q0 FROM e),
         |w1 AS (SELECT *, min(CASE WHEN event_type='click' AND q0 IS NOT NULL
         |                          AND us - q0 <= $FunnelWithinUs THEN us END)
         |  OVER (PARTITION BY user_id ORDER BY us, event_id
         |        ROWS UNBOUNDED PRECEDING) AS q1 FROM w0),
         |w2 AS (SELECT *, min(CASE WHEN event_type='purchase' AND q1 IS NOT NULL
         |                          AND us - q1 <= $FunnelWithinUs THEN us END)
         |  OVER (PARTITION BY user_id ORDER BY us, event_id
         |        ROWS UNBOUNDED PRECEDING) AS q2 FROM w1),
         |pu AS (SELECT user_id,
         |  max(CASE WHEN q0 IS NOT NULL THEN 1 ELSE 0 END) AS f0,
         |  max(CASE WHEN q1 IS NOT NULL THEN 1 ELSE 0 END) AS f1,
         |  max(CASE WHEN q2 IS NOT NULL THEN 1 ELSE 0 END) AS f2
         |  FROM w2 GROUP BY user_id)
         |SELECT stage, n_users FROM (
         |  SELECT '01_view' AS stage, CAST(sum(f0) AS BIGINT) AS n_users FROM pu
         |  UNION ALL
         |  SELECT '02_click', CAST(sum(f1) AS BIGINT) FROM pu
         |  UNION ALL
         |  SELECT '03_purchase', CAST(sum(f2) AS BIGINT) FROM pu)
         |ORDER BY stage""".stripMargin,

    "q_events_retention" ->
      s"""WITH su AS (SELECT user_id,
         |    CAST(floor(min(epoch_us(ts)) / $DayUs) AS BIGINT) AS cohort
         |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
         |act AS (SELECT DISTINCT user_id,
         |    CAST(floor(epoch_us(ts) / $DayUs) AS BIGINT) AS bucket
         |  FROM events)
         |SELECT cohort, CAST(bucket - cohort AS BIGINT) AS offset_d,
         |  CAST(count(*) AS BIGINT) AS n_users
         |FROM su JOIN act USING (user_id)
         |WHERE bucket - cohort BETWEEN 0 AND 7
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
