package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column => ofExpr, expression => toExpr}
import org.apache.spark.sql.functions._

/** Portable text-hashing primitives shared by the dedup / fingerprint
  * operators (SURVEY.md §2.8 L3–L5, L11; fingerprinting per the
  * LLM-pipeline mandate).
  *
  * Design constraint: the driver's t2 gate hash-compares results against
  * DuckDB 1.0.0, and the two engines' builtin hash functions
  * (xxhash64 vs duckdb hash) can never agree. So every hash here is a
  * plain polynomial rolling hash over int64 arithmetic — bit-identical in
  * any engine that has 64-bit integers and a left-fold list reduce.
  *
  *   tokenHash(t)  = fold chars c of t:   h -> (h*31  + ascii(c)) mod P
  *   docHash(ths)  = fold token-hashes x: h -> (h*131 + x)        mod P
  *   P = 1_000_000_007 (hash values < 2^30, so every intermediate
  *   product stays far below 2^63 — no overflow divergence).
  *
  * Scale note: these run as Catalyst higher-order functions (codegen'd
  * lambda over array), no UDF and no driver round-trip; on a 1000-executor
  * cluster they pipeline inside the scan stage. A custom codegen'd
  * Expression would save the per-char array materialization but is a
  * perf-only follow-up (SURVEY.md §4).
  */
object TextFns {
  val P = 1000000007L

  /** Whitespace tokens of a text column. */
  def tokens(c: Column): Column = split(c, " ")

  /** Array of token hashes for a text column (codegen'd kernel). */
  def tokenHashes(text: Column): Column = ofExpr(TokenHashesExpr(toExpr(text)))

  /** Order-sensitive whole-document hash from a token-hash array. */
  def docHash(tokenHashArr: Column): Column = ofExpr(DocHashExpr(toExpr(tokenHashArr)))

  /** k-token shingle hashes (rolling): h(w_i..w_{i+k-1}) as a polynomial
    * fold; empty array when the doc has fewer than k tokens. */
  def shingleHashes(tokenHashArr: Column, k: Int): Column =
    ofExpr(ShingleHashesExpr(toExpr(tokenHashArr), k))

  /** MinHash signature: for each (a,b) seed, min over token hashes of
    * (a*x + b) mod P. Input must be non-empty (guard at call site). */
  def minHashSignature(tokenHashArr: Column, seeds: Seq[(Long, Long)]): Column =
    ofExpr(MinHashSigExpr(toExpr(tokenHashArr),
      seeds.map(_._1).toArray, seeds.map(_._2).toArray))

  /** LSH band keys from a signature: rows of `rowsPerBand` hashes fold to
    * one scalar key, offset by band index so bands never collide. */
  def bandKeys(signature: Column, nBands: Int, rowsPerBand: Int): Column =
    ofExpr(BandKeysExpr(toExpr(signature), nBands, rowsPerBand))

  /** SimHash fingerprint (bit-majority over the (a*x+b) mod P view of
    * the token hashes), <= 30 bits per view. */
  def simHash(tokenHashArr: Column, bits: Int, a: Long = 1L, b: Long = 0L): Column =
    ofExpr(SimHashExpr(toExpr(tokenHashArr), bits, a, b))

  /** Signed feature-hash embedding ("hashing trick") of a token-hash
    * array into `dim` integer buckets. */
  def featureHashEmbed(tokenHashArr: Column, dim: Int): Column =
    ofExpr(FeatureHashEmbedExpr(toExpr(tokenHashArr), dim))

  // ---- Reference formulations (portable HOF forms the kernels must
  // ---- match bit-for-bit; exercised by HashKernelSpec) ----

  /** Polynomial char hash of one token — HOF reference form. */
  def tokenHashHof(tok: Column): Column =
    aggregate(
      transform(split(tok, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (h, x) => pmod(h * lit(31L) + x, lit(P)))

  def tokenHashesHof(text: Column): Column = transform(tokens(text), tokenHashHof _)

  def docHashHof(tokenHashArr: Column): Column =
    aggregate(tokenHashArr, lit(0L), (h, x) => pmod(h * lit(131L) + x, lit(P)))

  def shingleHashesHof(tokenHashArr: Column, k: Int): Column =
    when(size(tokenHashArr) < k, array().cast("array<bigint>"))
      .otherwise(
        transform(
          sequence(lit(1), size(tokenHashArr) - lit(k - 1)),
          i => aggregate(
            slice(tokenHashArr, i, lit(k)), lit(0L),
            (h, x) => pmod(h * lit(131L) + x, lit(P)))))

  def minHashSignatureHof(tokenHashArr: Column, seeds: Seq[(Long, Long)]): Column =
    array(seeds.map { case (a, b) =>
      array_min(transform(tokenHashArr,
        x => pmod(lit(a) * x + lit(b), lit(P))))
    }: _*)

  def featureHashEmbedHof(tokenHashArr: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), b =>
      coalesce(
        aggregate(
          filter(tokenHashArr, h => pmod(h, lit(dim.toLong)) === b.cast("long")),
          lit(0L),
          (acc, h) => acc +
            when(pmod(h, lit(2L * dim)) < lit(dim.toLong), lit(1L)).otherwise(lit(-1L))),
        lit(0L)))

  def bandKeysHof(signature: Column, nBands: Int, rowsPerBand: Int): Column = {
    val bigP = 999999999999989L
    array((0 until nBands).map { b =>
      val fold = (0 until rowsPerBand)
        .map(r => element_at(signature, b * rowsPerBand + r + 1))
        .reduce((acc, x) => pmod(acc * lit(1000003L) + x, lit(bigP)))
      (pmod(fold, lit(bigP)) * lit(nBands.toLong) + lit(b.toLong))
    }: _*)
  }

  // ---- deterministic multi-byte transliteration (the q320 layer,
  // ---- lifted in r15 so hash-kernel queries can reuse it) ----

  private val xlitMap: Seq[(String, String, String)] = Seq(
    ("de", "aous", "äöüß"),
    ("es", "aeion", "áéíóñ"),
    ("fr", "aeicu", "àéèçû"),
    ("zh", "aeioubcdfghlmnprst",
      "一二三四五六七八九十" +
      "人大小中上下左右"))

  /** Per-language script transliteration of the ASCII fixture text —
    * codepoint-1:1 and space-free (token/char counts preserved, bytes
    * inflate per script), injective per language. `en` and unknown
    * langs pass through. Both engines' `translate` map per codepoint,
    * so the layer is oracle-safe (proved end-to-end by q320). */
  def scriptXlit(lang: Column, text: Column): Column =
    xlitMap.foldRight(text) { case ((lg, from, to), acc) =>
      when(lang === lg, translate(text, from, to)).otherwise(acc)
    }

  /** DuckDB mirror of [[scriptXlit]] for a `lang` / text expression
    * (multi-byte targets embedded as literal UTF-8 — the oracle SQL
    * travels as UTF-8 JSON, exactly like the q320 inline form did). */
  def scriptXlitSql(lang: String, text: String): String = {
    val cases = xlitMap.map { case (lg, from, to) =>
      s"      WHEN '$lg' THEN translate($text, '$from', '$to')"
    }.mkString("\n")
    s"CASE $lang\n$cases\n      ELSE $text END"
  }

  // ---- DuckDB SQL mirrors (string fragments for oracleSql) ----

  /** DuckDB: token hash of a string expression `t`. */
  def tokenHashSql(t: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($t,''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(h, x) -> (h * 31 + x) % $P)"

  /** DuckDB: array of token hashes of text expression `t`. */
  def tokenHashesSql(t: String): String =
    s"list_transform(string_split($t,' '), tok -> ${tokenHashSql("tok")})"

  /** DuckDB: fold a bigint-list expression with the doc-hash polynomial. */
  def docHashSql(arr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $arr), " +
      s"(h, x) -> (h * 131 + x) % $P)"

  /** DuckDB: signed feature-hash embedding of a token-hash list `th`
    * (all hashes non-negative, so `%` needs no pmod wrapper). */
  def featureHashEmbedSql(th: String, dim: Int): String =
    s"list_transform(generate_series(0, ${dim - 1}), b -> " +
      s"CAST(coalesce(list_sum(list_transform(" +
      s"list_filter($th, h -> h % $dim = b), " +
      s"h -> CASE WHEN h % ${2 * dim} < $dim THEN 1 ELSE -1 END)), 0) AS BIGINT))"
}
