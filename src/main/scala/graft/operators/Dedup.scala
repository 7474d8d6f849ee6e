package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (SURVEY.md
  * §2.4): exact (hash), MinHash+LSH banding, SimHash, char-n-gram
  * Jaccard.
  *
  * All hashing is md5-based so results are deterministic across engines
  * and runs — at 100 TB a re-run must bucket identically. Every stage is
  * relational (explode → partial agg), so dedup scales as: mapper-only
  * signature computation, one shuffle per agg on (doc, seed/band) keys,
  * and an LSH candidate join whose size is bands × bucket-collisions,
  * never n².
  */
object Dedup {

  /** Exact duplicate groups by content hash. */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"), max(col(idCol)).as("dup_id"))
      .filter(col("n") > 1)

  /** Word 3-gram shingles, distinct per doc, from a pre-split token
    * array (codegen CSE keeps the split single-evaluation). Values match
    * the DuckDB oracles' 1-based construction of the same strings.
    */
  def shingles(textCol: Column): Column = shinglesOf(split(textCol, " "))

  private def shinglesOf(toks: Column): Column =
    array_distinct(when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        j => concat_ws(" ", element_at(toks, j + 1), element_at(toks, j + 2),
          element_at(toks, j + 3))))
      .otherwise(array().cast("array<string>")))

  /** (id, shingle) DISTINCT rows, built without lambda-based HOFs: the
    * token array is exploded by position and each shingle assembled with
    * codegen'd element_at/concat_ws, then deduped by a hash aggregate.
    * Same strings as `shingles`, but the whole pass stays inside
    * whole-stage codegen (interpreted transform dominates otherwise).
    */
  def shingleRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    shingleRowsRaw(df, idCol, textCol).distinct()

  /** Same rows WITHOUT the distinct — one fewer shuffle for consumers
    * whose aggregate is duplicate-insensitive (min/max).
    */
  def shingleRowsRaw(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 3)).as("j"))
      .select(col(idCol), concat_ws(" ", element_at(col("toks"), col("j") + 1),
        element_at(col("toks"), col("j") + 2), element_at(col("toks"), col("j") + 3)).as("sh"))

  /** doc → one wide row of `numHashes` minhashes (mh0..mhN): min over
    * shingles of md5(seed|shingle), all seeds in ONE partial-aggregable
    * pass — no seed explode, so the shuffle carries |shingles| rows, not
    * |shingles|×numHashes. Values are identical to the row-per-seed
    * formulation the oracle SQL uses.
    */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(s =>
      min(md5(concat(lit(s + "|"), col("sh")))).as(s"mh$s"))
    // min() is duplicate-insensitive, so the raw (undeduped) shingle
    // stream feeds the partial aggregate directly: one shuffle of one
    // wide row per doc per partition instead of distinct's extra
    // full-width (id, shingle) exchange.
    shingleRowsRaw(df, idCol, textCol)
      .groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
  }

  /** LSH band hashes from the wide signature: hash each band's
    * (seed-ordered) minhashes — a pure mapper, no second aggregation.
    */
  def lshBandHashes(sig: DataFrame, idCol: String, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until rows).map(i => col(s"mh${b * rows + i}")): _*))
          .as("band_hash"))
    }
    sig.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
  }

  /** Candidate pairs: ids sharing any LSH band bucket. The join key is
    * (band, band_hash), so work is proportional to real collisions.
    */
  def lshCandidates(bandHashes: DataFrame, idCol: String): DataFrame = {
    val a = bandHashes.select(col(idCol).as("id_a"), col("band"), col("band_hash"))
    val b = bandHashes.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** MinHash-LSH near-dup pairs with true-Jaccard confirmation on the
    * candidates only.
    */
  def minHashNearDups(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 8, bands: Int = 2,
                      threshold: Double = 0.5): DataFrame = {
    val sig = minhashSignature(df, idCol, textCol, numHashes)
    val cands = lshCandidates(lshBandHashes(sig, idCol, numHashes, bands), idCol)
    val sh = shingleRows(df, idCol, textCol).select(col(idCol).as("id"), col("sh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    // equijoin on (id, shingle) — the shingle match is a hash-join key,
    // not a post-join filter, so the intermediate is the intersection
    // itself rather than |sh_a|×|sh_b| per candidate pair.
    val inter = cands
      .join(sh.withColumnRenamed("id", "id_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("id", "id_b"), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), Seq("id_b"))
      .withColumn("jaccard", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Char n-gram distinct set. */
  def charNgrams(textCol: Column, n: Int): Column = {
    val t = textCol.toString
    array_distinct(expr(
      s"CASE WHEN length($t) >= $n THEN " +
        s"transform(sequence(1, length($t) - ${n - 1}), i -> substring($t, i, $n)) " +
        s"ELSE cast(array() AS ARRAY<STRING>) END"))
  }

  /** Jaccard over char n-grams between paired rows (id, id+step),
    * computed as a codegen'd equijoin on exploded grams (doc, gram):
    * the matched rows ARE the intersection, so no interpreted
    * array_intersect runs per pair. The pair skeleton left-joins the
    * intersection counts back so 0-overlap pairs survive.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // Single-pass, fully codegen'd, ONE scan of the corpus: each
    // (doc, gram) occurrence (exploded positions + substr — no
    // lambda-based HOFs, which run interpreted) is credited to the two
    // pairs it can participate in (pair k compares docs k and k+1).
    // One (pair, gram) aggregation marks side presence — this also
    // dedups repeated grams, so no per-doc distinct pass — and one
    // (pair) aggregation produces sizes + intersection together.
    val grams = df.select(col(idCol).as("id"), col(textCol).as("t"))
      .filter(length(col("t")) >= n) // sequence(1,0) would DEscend
      .select(col("id"), col("t"),
        explode(sequence(lit(1), length(col("t")) - (n - 1))).as("i"))
      .select(col("id"), substr(col("t"), col("i"), lit(n)).as("ng"))
    val sides = grams.select(explode(array(
        struct(col("id").as("pk"), lit(true).as("a"), lit(false).as("b")),
        struct((col("id") - 1).as("pk"), lit(false).as("a"), lit(true).as("b"))))
        .as("s"), col("ng"))
      .select(col("s.pk").as("pk"), col("ng"), col("s.a").as("a"), col("s.b").as("b"))
    sides.groupBy("pk", "ng")
      .agg(max("a").as("ha"), max("b").as("hb"))
      .groupBy("pk")
      .agg(sum(when(col("ha"), 1).otherwise(0)).as("sz_a"),
        sum(when(col("hb"), 1).otherwise(0)).as("sz_b"),
        sum(when(col("ha") && col("hb"), 1).otherwise(0)).as("inter"))
      .filter(col("sz_a") > 0 && col("sz_b") > 0) // pair needs both docs
      .select(col("pk").as("doc_a"), (col("pk") + 1).as("doc_b"),
        round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6).as("jaccard"))
  }

  /** 60-bit SimHash as a 15-hex-char string. Fully relational: tokens →
    * md5 hex digits → per-bit votes → majority bits → hex digits. The
    * same computation is expressible in any SQL engine, which is what
    * pins the oracle.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // One explode (token rows only — never token × bit), then the 60
    // per-bit ±1 votes are sixty codegen'd int columns partial-summed
    // map-side: the only shuffle carries one row of 60 ints per doc per
    // partition. At 100 TB that is a scan plus a near-free reduce.
    val toks = df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val voteCols = for (p <- 1 to 15; k <- 0 until 4) yield
      when((shiftright(expr(s"instr('0123456789abcdef', substring(h, $p, 1)) - 1"), k) % 2)
        === 1, 1).otherwise(-1).as(s"v_${p}_$k")
    val summed = toks.select((col(idCol) +: voteCols): _*)
      .groupBy(col(idCol))
      .agg(sum(s"v_1_0").as("s_1_0"),
        (for (p <- 1 to 15; k <- 0 until 4; if !(p == 1 && k == 0)) yield
          sum(s"v_${p}_$k").as(s"s_${p}_$k")): _*)
    summed.select(col(idCol),
      concat((1 to 15).map { p =>
        val dig = (0 until 4).map(k =>
          when(col(s"s_${p}_$k") > 0, lit(1 << k)).otherwise(lit(0))).reduce(_ + _)
        substr(lit("0123456789abcdef"), dig + 1, lit(1))
      }: _*).as("simhash"))
  }
}
