package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level text primitives shared by the dedup / text-analysis /
  * similarity operators.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs — stays inside whole-stage codegen) and has an exact DuckDB
  * mirror used by the oracle SQL, so results are bit-identical across
  * engines:
  *
  *   - tokens:  `list_filter(regexp_split_to_array(lower(trim(x)),'[ \t\n\r\f]+'), t -> t <> '')`
  *     — the whitespace class is written EXPLICITLY because Java's `\s`
  *     matches `\x0B` (vertical tab) where RE2's does not; the explicit
  *     class pins both engines to the same five characters.
  *   - hash:    `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)` — 60-bit
  *     positive value from the md5 hex prefix; md5 is identical everywhere,
  *     unlike murmur/xxhash whose seeds differ per engine.
  *
  * The array-fold style (transform/aggregate over token arrays) is the scale
  * path: it runs entirely map-side inside the scan stage — no explode, no
  * shuffle — so at 100 TB it costs one pass over the data.
  */
object Text {

  /** The pinned whitespace characters, as regex-class CONTENT (never use
    * `\s`: Java's matches `\x0B` where RE2's does not — see the object
    * scaladoc). Interpolate into any pattern, Spark- or oracle-side, that
    * needs a whitespace or non-whitespace class so every regex in the
    * engine agrees on the same five characters. */
  val WsChars: String = " \\t\\n\\r\\f"

  /** Whitespace tokens of lowercased text, empty strings dropped. The
    * explicit `[ \t\n\r\f]` class (not `\s`) keeps the Java and RE2
    * engines on the same character set — see the object scaladoc. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), s"[$WsChars]+"), t => t =!= "")

  /** Materialize a `_toks` token-array column and spread rows across all
    * cores. The repartition Exchange is load-bearing twice over: it
    * parallelizes single-file local scans, AND it is a barrier
    * CollapseProject cannot cross — downstream expressions reference the
    * materialized array attribute instead of re-inlining (and re-evaluating)
    * the tokenize chain per use. Without it, `element_at(tokens(text), i)`
    * inside a shingle lambda re-tokenizes the whole document per element:
    * O(tokens²) interpreted work per row. */
  def withTokens(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("_toks", tokens(col("text")))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Distinct word 3-shingles; empty array for texts under 3 tokens. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Distinct word 2-shingles (bigrams); empty array under 2 tokens. */
  def shingles2(toks: Column): Column =
    when(size(toks) >= 2,
      array_distinct(transform(sequence(lit(1), size(toks) - 1), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Distinct word 5-shingles (long spans, the decontamination length —
    * see Dedup.decontaminate); empty array under 5 tokens. */
  def shingles5(toks: Column): Column =
    when(size(toks) >= 5,
      array_distinct(transform(sequence(lit(1), size(toks) - 4), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2), element_at(toks, i + 3), element_at(toks, i + 4)))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** 60-bit deterministic hash of a string, identical in Spark and DuckDB:
    * first 15 hex chars of md5, parsed base-16. */
  def sharedHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant: H(seed || ':' || s) — gives the independent hash
    * family used for MinHash signatures. */
  def sharedHash(s: Column, seed: Int): Column =
    sharedHash(concat(lit(s"$seed:"), s))

  /** Canonical bag-of-words digest: md5 over the sorted distinct tokens.
    * Single definition shared by dedup + fingerprint operators so the Spark
    * expression and its SQL mirror can never drift apart. */
  def contentFingerprint(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))

  def sqlContentFingerprint(toksExpr: String): String =
    s"md5(array_to_string(list_sort(list_distinct($toksExpr)), ' '))"

  /** Count of tokens that appear in a fixed marker set (lang-id / stopword
    * scoring). Pure array op, no shuffle. */
  def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => lit(w)): _*)))

  // ---- DuckDB mirrors (string builders used by the oracle SQL) ----------

  def sqlTokens(textExpr: String): String =
    s"list_filter(regexp_split_to_array(lower(trim($textExpr)), '[$WsChars]+'), t -> t <> '')"

  def sqlShingles2(toksExpr: String): String =
    s"""CASE WHEN len($toksExpr) >= 2
       | THEN list_distinct(list_transform(generate_series(1, len($toksExpr)-1),
       |   i -> concat_ws(' ', ($toksExpr)[i], ($toksExpr)[i+1])))
       | ELSE []::VARCHAR[] END""".stripMargin

  def sqlShingles3(toksExpr: String): String =
    s"""CASE WHEN len($toksExpr) >= 3
       | THEN list_distinct(list_transform(generate_series(1, len($toksExpr)-2),
       |   i -> concat_ws(' ', ($toksExpr)[i], ($toksExpr)[i+1], ($toksExpr)[i+2])))
       | ELSE []::VARCHAR[] END""".stripMargin

  def sqlShingles5(toksExpr: String): String =
    s"""CASE WHEN len($toksExpr) >= 5
       | THEN list_distinct(list_transform(generate_series(1, len($toksExpr)-4),
       |   i -> concat_ws(' ', ($toksExpr)[i], ($toksExpr)[i+1], ($toksExpr)[i+2],
       |                  ($toksExpr)[i+3], ($toksExpr)[i+4])))
       | ELSE []::VARCHAR[] END""".stripMargin

  def sqlHash(sExpr: String): String =
    s"CAST(concat('0x', substr(md5($sExpr), 1, 15)) AS BIGINT)"

  def sqlHash(sExpr: String, seed: Int): String =
    sqlHash(s"concat('$seed:', $sExpr)")

  def sqlCountIn(toksExpr: String, words: Seq[String]): String =
    s"len(list_filter($toksExpr, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
}
