package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines: fixed-size
  * chunking with overlap (RAG / context-window prep), C4-style
  * cross-corpus line deduplication, and TF-IDF term scoring.
  *
  * Scale design: chunking is a pure per-row array expression (no
  * shuffle — it runs inside the scan stage); line dedup shuffles once
  * on the line content and once on doc_id for reassembly; TF-IDF is
  * two keyed aggregations plus a 1-row broadcast for the corpus size.
  * Nothing here is O(n²) and nothing collects to the driver.
  */
object Corpus {

  /** Fixed-size character chunks with overlap. Chunk starts are
    * `0, size-overlap, 2(size-overlap), …` while they fall inside the
    * text; every doc yields ≥1 chunk (empty text → one empty chunk).
    * Runs entirely inside the scan stage: `sequence` + `posexplode`
    * are codegen'd per-row ops, so a 100 TB corpus chunks without a
    * single shuffle and chunks stay co-partitioned with their doc.
    */
  def chunk(df: DataFrame, textCol: String, idCol: String,
            size: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val step = size - overlap
    val starts = sequence(lit(0),
      greatest(length(col(textCol)) - 1, lit(0)), lit(step))
    df.select(col(idCol), col(textCol),
        posexplode(starts).as(Seq("chunk_id", "start")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        expr(s"substring($textCol, start + 1, $size)").as("chunk"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
  }

  /** C4-style line-level dedup across the whole corpus: a line that
    * occurs anywhere else in the corpus is kept only at its first
    * occurrence (lowest doc id, then lowest line position) and removed
    * everywhere else; each doc is reassembled from its surviving lines
    * in order. Returns one row per input doc:
    * (id, n_lines, n_kept, kept_text).
    *
    * The occurrence ranking is a window over the line content — a
    * single hash-partitioned shuffle on the line (the 100 TB-safe
    * formulation: state per distinct line, not per pair); reassembly
    * is one groupBy on the doc id. Docs whose every line is removed
    * survive with kept_text = ''.
    */
  def lineDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val rn = row_number().over(
      Window.partitionBy(col("line")).orderBy(col("id"), col("pos")))
    lines.withColumn("keep", rn === 1)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("pos"), col("line"))))),
            x => x("line")),
          "\n").as("kept_text"))
  }

  /** TF-IDF term scores: tf = term count within the doc, df = number
    * of docs containing the term, idf = ln(N/df). Two keyed shuffles
    * — (doc, term) then term — and the corpus size N joins back as a
    * 1-row broadcast, so the plan has no single-partition stage.
    * The score's float math is `tf * ln(N / df)` evaluated in exactly
    * that operation order (oracle mirrors it bit-for-bit).
    */
  /** Okapi BM25 term scores. Same two keyed shuffles as [[tfidf]];
    * the per-doc length and the corpus stats (N, total length) ride
    * along as a 1-row broadcast. Float math is evaluated in one fixed
    * operation order (mirrored by the oracle):
    * `idf = ln((N - df + 0.5) / (df + 0.5))`,
    * `score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`.
    * Doc lengths accumulate as exact integers; `avgdl` is a single
    * double division at the end.
    */
  def bm25(df: DataFrame, textCol: String, idCol: String,
           tokens: Column => Column,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = df.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
    val dt = toks.select(col("id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("w")).cast("long")).as("tot_len"))
    val n = col("n_docs").cast("double")
    val avgdl = col("tot_len").cast("double") / col("n_docs").cast("double")
    val idf = log((n - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5))
    val tfd = col("tf").cast("double")
    val score = idf * (tfd * (k1 + 1.0)) /
      (tfd + lit(k1) * (lit(1.0) - b + lit(b) * col("dl").cast("double") / avgdl))
    dt.join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .select(col("id"), col("term"), col("tf"), col("df"),
        score.as("bm25_raw"))
  }

  /** Inverted index: per term, document frequency and the posting list
    * head (first `cap` doc ids ascending, comma-joined). One keyed
    * shuffle on the term; the per-term state is bounded by `cap` in
    * the output (collect happens per term — at 100 TB the hot-term
    * list would be capped pre-agg with a per-term top-k, same shape).
    */
  def invertedIndex(df: DataFrame, textCol: String, idCol: String,
                    tokens: Column => Column, cap: Int): DataFrame =
    df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .distinct()
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        concat_ws(",",
          transform(slice(array_sort(collect_list(col("id"))), 1, cap),
            _.cast("string"))).as("postings"))

  /** Duplicated-span detection (the exact-substring dedup signal of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better", arXiv:2107.06499): a word n-gram that occurs in
    * `minDocs`+ distinct documents is a duplicated span; each document
    * is scored by the fraction of its distinct n-grams that are
    * duplicated. Unlike whole-doc MinHash, this catches boilerplate
    * and quoted passages INSIDE otherwise-unique documents.
    *
    * Plan shape: shingle explode feeds (a) the span document-frequency
    * aggregate and (b) the per-doc rollup — one persist, two keyed
    * shuffles (shingle, then doc id), join back on the shingle. The
    * same shape as [[tfidf]]'s df computation: state is per DISTINCT
    * span, never per pair, so a 100 TB corpus shuffles linearly.
    * `dup_frac` is one IEEE division of exact integers — bit-identical
    * on any engine at any parallelism.
    */
  def spanDedup(df: DataFrame, textCol: String, idCol: String,
                n: Int, minDocs: Int, flagAt: Double): DataFrame = {
    val sh = Dedup.docShingles(df, textCol, idCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spanDf = sh.groupBy(col("sh"))
      .agg(count(lit(1)).as("span_docs"))
    val frac = col("n_dup_spans").cast("double") / col("n_spans")
    sh.join(spanDf, "sh")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("span_docs") >= minDocs, 1L).otherwise(0L))
          .as("n_dup_spans"))
      .select(col("id"), col("n_spans"), col("n_dup_spans"),
        frac.as("dup_frac"),
        (frac >= flagAt).as("flagged"))
  }

  def tfidf(df: DataFrame, textCol: String, idCol: String,
            tokens: Column => Column): DataFrame = {
    val dt = df.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    dt.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"), col("tf"), col("df"),
        (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
          .as("tfidf_raw"))
  }
}
