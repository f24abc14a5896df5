package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
  * (BASELINE.json training-data-pipeline surface).
  *
  * Engine-portability rule: every hash is md5-hex-string based so a SQL
  * oracle (DuckDB) reproduces signatures bit-for-bit; min/argmax over hex
  * strings is a valid uniform hash family. No UDFs — signature
  * computation is `transform`/`aggregate` higher-order expressions
  * (codegen'd, map-side, zero shuffle).
  *
  * Scale design (100 TB): exact dedup = one hash-partitioned groupBy on a
  * 32-byte key. MinHash-LSH shuffles only (band, key) pairs — b×32 bytes
  * per doc, never doc×doc; candidate verification joins the tiny
  * signature table. SimHash clusters via a single groupBy on the 32-bit
  * signature. The O(n²)-looking Jaccard join is gram-bucketed: pairs only
  * form for docs sharing a concrete shingle.
  */
object Dedup {

  /** Word n-gram shingles (distinct), from a pre-normalized text column. */
  def shingles(text: Column, n: Int = 2): Column = {
    val toks = TextAnalysis.tokens(text)
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => array_join(slice(toks, i, lit(n)), " "))
    when(size(toks) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup groups: canonical id + multiplicity per content hash
    * (hash-groupBy; at scale this is the classic map-side-combined
    * shuffle on md5). */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(md5(TextAnalysis.normalize(col(textCol)).cast("binary")).as("content_hash"),
        col(idCol))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** MinHash signature columns h0..h{n-1}: per hash p, the min md5 of
    * `"p|" + shingle` — computed per row without exploding. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        nHashes: Int = 8): DataFrame = {
    val sh = shingles(TextAnalysis.normalize(col(textCol)))
    val sigCols = (0 until nHashes).map { p =>
      array_min(transform(sh, s => md5(concat(lit(s"$p|"), s)))).as(s"h$p")
    }
    df.select((col(idCol).as("doc") +: sigCols): _*)
      .where(col("h0").isNotNull) // docs with < n tokens have no shingles
  }

  /** LSH banding: r consecutive minhashes concatenated per band; docs
    * colliding in any band become candidate pairs; candidates are then
    * verified against the full signature (estimated Jaccard =
    * fraction of agreeing minhashes). Returns (doc_a, doc_b, n_agree). */
  def lshCandidatePairs(sigs: DataFrame, nHashes: Int = 8, bandSize: Int = 2): DataFrame = {
    val nBands = nHashes / bandSize
    val bandStructs = (0 until nBands).map { b =>
      val key = concat((0 until bandSize).map(r => col(s"h${b * bandSize + r}")): _*)
      struct(lit(b).as("band"), key.as("key"))
    }
    val bands = sigs.select(col("doc"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    val agree = (0 until nHashes)
      .map(p => when(col(s"sa.h$p") === col(s"sb.h$p"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sigs.as("sa"), col("doc_a") === col("sa.doc"))
      .join(sigs.as("sb"), col("doc_b") === col("sb.doc"))
      .select(col("doc_a"), col("doc_b"), agree.cast("int").as("n_agree"))
  }

  /** 32-bit SimHash as a '0'/'1' string: bit j is the sign of the token
    * vote sum, where a token votes +1 iff hex digit j of its md5 has its
    * high bit set. One md5 per token, reused across all 32 bits. */
  def simhash(text: Column): Column = {
    val tokHashes = transform(TextAnalysis.tokens(TextAnalysis.normalize(text)), t => md5(t.cast("binary")))
    val bits = (1 to 32).map { j =>
      val votes = aggregate(tokHashes, lit(0),
        (acc, h) => acc + when(substring(h, j, 1) >= "8", 1).otherwise(-1))
      when(votes >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** SimHash near-dup clusters: signatures shared by more than one doc. */
  def simhashClusters(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(simhash(col(textCol)).as("simhash"), col(idCol))
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("min_doc"))
      .where(col("n_docs") > 1)

  /** Exact n-gram Jaccard pairs above a rational threshold numJ/denJ.
    * Gram-bucketed join (only docs sharing a shingle pair up), integer
    * cross-multiplied threshold — no float division anywhere. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 2, numJ: Int = 1, denJ: Int = 5): DataFrame = {
    val sh = df.select(col(idCol).as("doc"),
        explode(shingles(TextAnalysis.normalize(col(textCol)), n)).as("s"))
    val cnt = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        col("ca.n_sh").as("n_a"), col("cb.n_sh").as("n_b"))
      // J = i/(na+nb-i) >= numJ/denJ  <=>  denJ*i >= numJ*(na+nb-i)
      .where(lit(denJ) * col("n_inter") >=
        lit(numJ) * (col("n_a") + col("n_b") - col("n_inter")))
  }
}
