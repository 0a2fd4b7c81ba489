package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling & split assignment for training pipelines.
 *
 * Random-seed sampling (`df.sample`) is reproducible only within one
 * engine+partitioning; corpus SPLITS must be stable across reruns,
 * engines, and repartitions, so membership is a pure function of the
 * key: an md5 bucket. Scan-speed column algebra — no shuffle, no
 * state, and any engine (including the DuckDB oracle) computes the
 * same assignment.
 */
object Sampling {

  /** Uniform bucket in [0, 2^32) from the key's md5 — the split
    * coordinate. Collision-free w.r.t. intent: equal keys (however the
    * corpus is partitioned) always land in the same bucket.
    *
    * INDEPENDENCE PITFALL: two hash-membership decisions over the SAME
    * key are perfectly correlated — e.g. a 50% `hashSample` followed by
    * a 0.9/0.05/0.05 `assignSplit` puts every survivor in "train",
    * because survivors all have bucket < 0.5·2^32. Compose decisions
    * with distinct `salt`s (each salt is an independent coordinate);
    * the default empty salt preserves the raw-md5 bucket. */
  def hashBucket(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt)).cast("binary")),
      1, 8), 16, 10).cast("long")

  /** Exact integer thresholds for cumulative fractions of 2^32. */
  private[graft] def cuts(fracs: Seq[Double]): Seq[Long] =
    fracs.scanLeft(0.0)(_ + _).map(f => (f * (1L << 32)).toLong)

  /**
   * Assign each row a named split ("train"/"val"/"test"…) by hash
   * bucket: fractions become exact integer cut points of the bucket
   * space, so e.g. 0.8/0.1/0.1 is an eternal, engine-independent
   * partition of keys. The last split absorbs rounding remainder —
   * fractions should sum to 1.
   */
  def assignSplit(df: DataFrame, key: String,
                  splits: Seq[(String, Double)],
                  salt: String = ""): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val cs = cuts(splits.map(_._2))
    val b = hashBucket(col(key), salt)
    val expr = splits.init.zipWithIndex.foldRight(lit(splits.last._1): Column) {
      case (((name, _), i), acc) => when(b < cs(i + 1), lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic Bernoulli-style subsample: keep keys whose bucket
    * falls below `fraction` of the space (stable across reruns and
    * engines, unlike seeded `sample`). */
  def hashSample(df: DataFrame, key: String, fraction: Double,
                 salt: String = ""): DataFrame =
    df.filter(hashBucket(col(key), salt) < (fraction * (1L << 32)).toLong)

  /** Deterministic k-fold assignment (cross-validation folds): fold =
    * bucket mod k — equal-probability folds, same engine-independent
    * membership guarantees as [[assignSplit]]. */
  def kFold(df: DataFrame, key: String, k: Int,
            salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    df.withColumn("fold", pmod(hashBucket(col(key), salt), lit(k.toLong)))
  }

  /**
   * Deterministic STRATIFIED subsample: a per-stratum keep fraction
   * (e.g. downsample an over-represented language while keeping rare
   * ones whole — the standard corpus-rebalancing move). Same membership
   * rule as [[hashSample]] — bucket(key) under the stratum's cut — so
   * it stays a pure scan-speed column predicate: no shuffle, no
   * sampling state, reproducible across engines and repartitionings,
   * and strata not listed fall back to `defaultFraction`.
   */
  def stratifiedSample(df: DataFrame, key: String, stratum: Column,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0,
                       salt: String = ""): DataFrame = {
    def cut(f: Double): Long = (f * (1L << 32)).toLong
    val cutCol = fractions.toSeq.sortBy(_._1)
      .foldRight(lit(cut(defaultFraction)): Column) {
        case ((s, f), acc) => when(stratum === s, lit(cut(f))).otherwise(acc)
      }
    df.filter(hashBucket(col(key), salt) < cutCol)
  }

  /**
   * Deterministic EPOCH SHUFFLE: a reproducible pseudo-random total
   * order over the corpus (the training-data ordering step — each salt
   * is one epoch's permutation). Order = (hashBucket(key, salt), key);
   * with a UNIQUE key that order is total, so the assigned positions
   * are a pure function of the corpus contents — independent of
   * partitioning, cluster shape, or reruns, unlike `orderBy(rand(seed))`.
   * `key` must be unique and non-null (like [[Packing.packBins]]'s id):
   * duplicate keys tie, and rows tied in the sort get
   * partition-dependent positions — exactly the nondeterminism this
   * operator exists to remove.
   *
   * Scale shape: one range-partitioned sort (Spark's Exchange
   * rangepartitioning — sampled boundaries affect only the partition
   * CUTS, never the order) plus zipWithIndex's small count job for
   * contiguous global positions; no single-partition window, no driver
   * data. Output: input columns + `pos` (0-based).
   */
  def shuffleEpoch(df: DataFrame, key: String, salt: String = ""): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField}
    val spark = df.sparkSession
    val sorted = df
      .withColumn("__b", hashBucket(col(key), salt))
      .orderBy(col("__b"), col(key))
      .drop("__b")
    val outSchema = sorted.schema.add(StructField("pos", LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * TARGET-MIXTURE sampling: downsample domains so the surviving corpus
   * matches declared mixture `weights` (e.g. 25% per language) while
   * keeping the MAXIMUM amount of data — the standard pre-training
   * recipe step ("train on X% web, Y% code, Z% books"). Unlike
   * [[stratifiedSample]] (per-stratum fractions given directly), the
   * fractions here are DERIVED: the binding domain is the one most
   * under-represented relative to its target (max achievable total
   * C = min_d n_d / w_d), every domain keeps w_d·C/n_d of its rows, and
   * the binding domain keeps everything (pinned by the n/w == C
   * equality case below — the derived fraction w·C/n rounds through
   * doubles and can land at 1 − 2⁻⁵³, which floor would turn into a
   * one-in-2³² row drop). Domains with no (or zero) weight are dropped.
   *
   * Scale shape: one tiny groupBy(domain) count, one broadcast scalar
   * (the capacity aggregate — the [[hashBucket]] membership predicate
   * then runs scan-speed under a broadcast join of the per-domain cut
   * table). No corpus-sized shuffle; membership is a pure function of
   * (key, domain table), reproducible across engines and
   * repartitionings like every sampler here.
   */
  def mixtureSample(df: DataFrame, key: String, domain: Column,
                    weights: Map[String, Double],
                    salt: String = ""): DataFrame = {
    require(weights.nonEmpty, "need at least one domain weight")
    require(weights.values.forall(_ >= 0), s"negative weight in $weights")
    val wCol = weights.toSeq.sortBy(_._1)
      .foldRight(lit(0.0): Column) {
        case ((d, w), acc) => when(col("__dom") === d, lit(w)).otherwise(acc)
      }
    val counts = df.groupBy(domain.as("__dom"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", wCol)
      .filter(col("__w") > 0)
    val capacity = counts.agg(min(col("__n") / col("__w")).as("__cap"))
    val cuts = counts.crossJoin(broadcast(capacity))
      .select(col("__dom"),
        when(col("__n") / col("__w") === col("__cap"), lit(1L << 32))
          .otherwise(floor(
            col("__w") * col("__cap") / col("__n") * lit(4294967296.0))
            .cast("long")).as("__cut"))
    df.join(broadcast(cuts), domain === col("__dom"))
      .filter(hashBucket(col(key), salt) < col("__cut"))
      .drop("__dom", "__cut")
  }

  /**
   * Mixture UP-sampling — the other half of the recipe problem: when a
   * domain is under its target and the corpus can't shrink (data-
   * constrained pre-training), the standard move is REPEATING
   * under-represented domains for multiple epochs. Every domain gets
   * epochs_d = maxEpochs · w_d·C/n_d (C = min_d n_d/w_d as in
   * [[mixtureSample]]): the most under-represented domain repeats
   * exactly `maxEpochs` times (pinned by the n/w == C equality branch,
   * like mixtureSample's binding domain), others get proportionally
   * fewer — including FRACTIONAL epochs below 1, so `maxEpochs = 1`
   * degenerates to exactly [[mixtureSample]]. Fractional parts become
   * a deterministic hash-membership extra copy; output rows carry a
   * `copy` index (0-based), so downstream shuffling/packing can treat
   * copies as distinct examples.
   *
   * Scale shape: identical to [[mixtureSample]] (tiny count agg +
   * broadcast scalar + broadcast cut table) plus one narrow explode of
   * `sequence(0, copies-1)` — no extra shuffle; expansion is bounded
   * by maxEpochs.
   */
  def mixtureUpsample(df: DataFrame, key: String, domain: Column,
                      weights: Map[String, Double],
                      maxEpochs: Double = 2.0,
                      salt: String = "copy"): DataFrame = {
    require(weights.nonEmpty, "need at least one domain weight")
    require(weights.values.forall(_ >= 0), s"negative weight in $weights")
    require(maxEpochs > 0, s"maxEpochs must be positive: $maxEpochs")
    val wCol = weights.toSeq.sortBy(_._1)
      .foldRight(lit(0.0): Column) {
        case ((d, w), acc) => when(col("__dom") === d, lit(w)).otherwise(acc)
      }
    val counts = df.groupBy(domain.as("__dom"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", wCol)
      .filter(col("__w") > 0)
    val capacity = counts.agg(min(col("__n") / col("__w")).as("__cap"))
    val ep = when(col("__n") / col("__w") === col("__cap"), lit(maxEpochs))
      .otherwise(lit(maxEpochs) * (col("__w") * col("__cap") / col("__n")))
    val cuts = counts.crossJoin(broadcast(capacity))
      .select(col("__dom"),
        floor(ep).cast("long").as("__base"),
        floor((ep - floor(ep)) * lit(4294967296.0)).cast("long").as("__fcut"))
    df.join(broadcast(cuts), domain === col("__dom"))
      .withColumn("__copies", col("__base") +
        when(hashBucket(col(key), salt) < col("__fcut"), 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__dom", "__base", "__fcut", "__copies")
  }

  /**
   * TEMPERATURE-scaled mixture sampling — the multilingual recipe where
   * targets are DERIVED from the data itself: w_d ∝ n_d^alpha. alpha=1
   * is the natural distribution (keeps everything — provably: the
   * derived fraction is n·C/n = C with C = 1), alpha=0 is uniform (every
   * domain downsampled to the smallest), and the classic alpha=0.5
   * flattens head domains by a square-root law: domain d keeps
   * sqrt(n_min/n_d) of its rows, so the smallest listed domain is
   * binding and keeps every row.
   *
   * The per-domain counts are a tiny driver-side aggregate (one row per
   * domain — the MLlib-centroid stance on bounded metadata) fed back
   * into [[mixtureSample]], whose capacity algebra is scale-invariant in
   * the weights, so unnormalized n^alpha works directly. Cross-engine
   * exactness holds at alpha = 0.5 (and 0, 1): IEEE sqrt, *, / are all
   * correctly rounded, so the DuckDB oracle recomputing sqrt(count)
   * reproduces the cut integers bit-for-bit; other alphas go through
   * `math.pow`, which is deterministic in-engine (the weights bake into
   * the plan as literals) but not guaranteed identical across libms.
   *
   * @param domains the domains to keep (others dropped), e.g. languages
   */
  def mixtureTemperature(df: DataFrame, key: String, domain: Column,
                         domains: Seq[String], alpha: Double = 0.5,
                         salt: String = ""): DataFrame = {
    require(domains.nonEmpty, "need at least one domain")
    require(alpha >= 0, s"alpha must be >= 0: $alpha")
    val counts = df.filter(domain.isin(domains: _*))
      .groupBy(domain.as("__dom")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = domains.map { d =>
      val n = counts.getOrElse(d, 0L).toDouble
      d -> (if (alpha == 0.5) math.sqrt(n) else math.pow(n, alpha))
    }.filter(_._2 > 0).toMap
    require(weights.nonEmpty, s"no rows in any of $domains")
    mixtureSample(df, key, domain, weights, salt)
  }

  /**
   * Deterministic WEIGHTED sample without replacement, k rows per
   * group (Efraimidis–Spirakis exponential clocks): each row draws an
   * exponential variate with rate = its weight from the key's hash and
   * the k SMALLEST variates per group win — the "pick proportional to
   * weight, remove, repeat" process in one pass, no sequential state.
   * The standard corpus move it serves: "k docs per language, weighted
   * by length/quality score", reproducible across engines, reruns, and
   * repartitionings like every sampler here.
   *
   * Cross-engine exactness (the ln problem, quantized away): libms are
   * only ulp-close on ln, so the variate is QUANTIZED —
   * u = (bucket+1)/2³² (a dyadic rational, exact in a double),
   * E = floor(−ln(u)·2²⁴) (integer; two ≤1-ulp ln implementations can
   * disagree only when the product lies within ~2⁻²⁸ of an integer —
   * P ≈ n·2⁻²⁸ per corpus, and a disagreement surfaces as an oracle
   * mismatch, never silent corruption), and priority = E / weight is a
   * single IEEE division — correctly rounded by spec, bit-identical in
   * any engine. Ties in the priority break by (bucket, key): exact.
   *
   * Rows with NULL or non-positive weight are excluded (zero inclusion
   * probability; a negative rate is meaningless).
   *
   * Scale shape: one Exchange on grp + a per-group top-k window — the
   * same shape as every per-group top-k here; group cardinality bounds
   * the sort, and for k ≪ group size AQE's skew split applies. Output:
   * input columns, ≤ k rows per group.
   */
  def weightedSample(df: DataFrame, key: String, grp: Column, weight: Column,
                     k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    import org.apache.spark.sql.expressions.Window
    val (pri, h) = aesPriority(col(key), weight, salt)
    val w = Window.partitionBy(grp).orderBy(pri.asc, h.asc, col(key).asc)
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** The exponential-clocks priority of [[weightedSample]]: quantized
    * variate E = ⌊−ln((bucket+1)/2³²)·2²⁴⌋ over the key's hash, then one
    * IEEE division by the weight. Returns (priority, bucket) — the
    * bucket doubles as the exact tie-break coordinate. */
  private def aesPriority(key: Column, weight: Column,
                          salt: String): (Column, Column) = {
    val h = hashBucket(key, salt)
    val u = (h + lit(1L)).cast("double") / lit(4294967296.0) // (0,1], dyadic
    val e = floor(-log(u) * lit(16777216.0)).cast("long")
    (e.cast("double") / weight.cast("double"), h)
  }

  /** GLOBAL (ungrouped) [[weightedSample]]: k rows from the whole frame,
    * weight-proportional without replacement. `orderBy(pri).limit(k)`
    * compiles to TakeOrderedAndProject — per-partition top-k then a
    * k-sized merge, never a global sort and never the one-group window
    * (`weightedSample(grp = lit(1))` would funnel the corpus through a
    * single task). Same quantized-variate exactness contract. */
  def weightedSampleGlobal(df: DataFrame, key: String, weight: Column,
                           k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val (pri, h) = aesPriority(col(key), weight, salt)
    df.filter(weight.isNotNull && weight > 0)
      .orderBy(pri.asc, h.asc, col(key).asc)
      .limit(k)
  }
}
