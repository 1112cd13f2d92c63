package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShims

/** Text-analysis building blocks for large-scale training-data pipelines.
  *
  * Everything here is a narrow, codegen'd projection over Spark builtins
  * (split / transform / aggregate / array_* — no UDFs, no shuffles), so
  * each operator runs embarrassingly parallel at any scale: a 100 TB
  * corpus is just more input splits, with no exchange anywhere in the
  * plan.
  *
  * Tokenization convention (shared with the DuckDB oracle, see
  * graft.oracle.DocSql): tokens are the single-space split of the text;
  * k-shingles are k consecutive tokens joined by a single space.
  */
object TextFunctions {

  /** Exact integer division (SQL `div`) — engine-independent, unlike
    * double division + truncation. */
  def intDiv(a: Column, b: Column): Column =
    ColumnShims.column(new IntegralDivide(
      ColumnShims.expression(a), ColumnShims.expression(b)))

  /** Unicode NFC normalization (canonical compose) — a native
    * codegen'd expression ([[graft.functions.NfcNormalize]]); the
    * no-op fast path returns the input value unchanged. Multilingual
    * corpora should normalize BEFORE [[tokens]] / fingerprinting /
    * content hashing: the composed and decomposed spellings of the
    * same text differ byte-wise, so un-normalized exact dedup,
    * shingle MinHash and vocabulary counts all treat them as distinct
    * content. The pipeline convention is normalize-then-tokenize —
    * `tokens(nfc(text))` — gated by q_text_nfc against DuckDB's
    * `nfc_normalize`. */
  def nfc(text: Column): Column =
    ColumnShims.column(graft.functions.NfcNormalize(ColumnShims.expression(text)))

  /** Whitespace tokens of a text column. NULL text is treated as the
    * empty string (-> a single empty token) so that Spark and the
    * DuckDB oracle agree on NULL rows: without the coalesce, Spark's
    * concat_ws path yields [""] while DuckDB's array_to_string yields
    * [NULL] for shingles of a NULL document (round-2 ADVICE). The
    * oracle applies the same coalesce (DocSql.docsToks). */
  def tokens(text: Column): Column = split(coalesce(text, lit("")), " ")

  /** Token count (BIGINT). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Adjacent token bigrams ("a b" strings); empty below 2 tokens.
    * Native single-pass expression
    * ([[graft.functions.TokenBigrams]]); [[bigramsBuiltin]] is the
    * executable spec. */
  def bigrams(text: Column): Column =
    ColumnShims.column(graft.functions.TokenBigrams(
      ColumnShims.expression(tokens(text))))

  /** Builtin-composed [[bigrams]] — the executable SPEC (CorpusOpsSpec
    * asserts equality with the native expression). The guard matters:
    * `sequence(0, -1)` would DESCEND in Spark. */
  def bigramsBuiltin(text: Column): Column = {
    val t = tokens(text)
    when(size(t) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(t) - 2),
        i => concat(element_at(t, i + 1), lit(" "), element_at(t, i + 2))))
  }

  /** Adjacent token trigrams ("a b c" strings); empty below 3 tokens.
    * Native single-pass expression
    * ([[graft.functions.TokenTrigrams]]); [[trigramsBuiltin]] is the
    * executable spec. */
  def trigrams(text: Column): Column =
    ColumnShims.column(graft.functions.TokenTrigrams(
      ColumnShims.expression(tokens(text))))

  /** Builtin-composed [[trigrams]] — the executable SPEC. */
  def trigramsBuiltin(text: Column): Column = {
    val t = tokens(text)
    when(size(t) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(t) - 3),
        i => concat(element_at(t, i + 1), lit(" "), element_at(t, i + 2),
          lit(" "), element_at(t, i + 3))))
  }

  /** Count of the most frequent bigram, computed WITHIN the row — no
    * per-(doc, ngram) shuffle, the whole repetition signal stays a
    * narrow projection (the 100 TB point: Gopher-style repetition
    * filters run over every document; keying a shuffle by (doc,
    * ngram) would dwarf the query). 0 for < 2 tokens. Native
    * single-pass expression ([[graft.functions.TopBigramCount]]);
    * [[topBigramCountBuiltin]] is the executable spec. */
  def topBigramCount(text: Column): Column =
    ColumnShims.column(graft.functions.TopBigramCount(
      ColumnShims.expression(tokens(text))))

  /** Builtin-composed [[topBigramCount]] — the executable SPEC
    * (CorpusOpsSpec asserts equality with the native expression):
    * sort the bigram array, then one aggregate() pass counts the
    * longest equal-run. Catalyst HOFs are CodegenFallback (per-element
    * interpreted lambdas), which made this the round-11 bench's
    * slowest query at 2.97 s — kept only as the spec. */
  def topBigramCountBuiltin(text: Column): Column =
    aggregate(array_sort(bigrams(text)),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Distinct-token count (BIGINT). */
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Total characters across tokens (text length minus separators). */
  def tokenChars(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t).cast("long"))

  /** Type-token ratio in parts-per-million, as exact integer math
    * (`distinct * 1e6 div total`) so the value is engine-independent.
    * A low TTR means repetitive text — a standard quality signal. */
  def qualityPpm(text: Column): Column =
    intDiv(distinctTokenCount(text) * lit(1000000L), tokenCount(text))

  /** Count of tokens in `stops`. */
  def stopwordCount(text: Column, stops: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stops.map(x => x: Any): _*))).cast("long")

  /** Stopword ratio in ppm (exact integer math). */
  def stopwordPpm(text: Column, stops: Seq[String]): Column =
    intDiv(stopwordCount(text, stops) * lit(1000000L), tokenCount(text))

  /** N-gram-profile language heuristic: classify by function-word rate.
    * On corpora where languages share a vocabulary this degrades to a
    * deterministic scoring rule — which is exactly what the correctness
    * gate checks (Spark and the oracle must agree on every row). */
  def langIdPredict(text: Column, stops: Seq[String], thresholdPpm: Long): Column =
    when(stopwordPpm(text, stops) >= thresholdPpm, lit("en")).otherwise(lit("other"))

  /** Array of k-token shingles ("character n-grams over words"): the
    * unit of near-duplicate detection. Documents shorter than k tokens
    * collapse to a single whole-document shingle. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - lit(k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** BPE-ish subword token pattern: alphanumeric runs or single
    * non-alphanumeric-non-space characters — the shape a byte-pair
    * tokenizer's pre-tokenization uses. ASCII-safe so Java and RE2
    * regex engines agree (the corpus is pure ASCII). */
  val SubwordPattern: String = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"

  /** Subword-token count (BIGINT): the standard "token budget"
    * estimate for an LLM pipeline, next to whitespace [[tokenCount]]. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(coalesce(text, lit("")), lit(SubwordPattern), lit(0))).cast("long")

  /** Content hash of the exact text bytes (exact-dedup key). */
  def contentHash(text: Column): Column = md5(text.cast("binary"))

  /** Duplicate-k-shingle ratio in ppm — the Gopher-style repetition
    * signal: (total - distinct) * 1e6 div total over the k-shingles.
    * High values flag boilerplate/repetitive documents. Exact integer
    * math (a one-shingle doc scores 0).
    *
    * Distinct shingles are counted via the one-pass native
    * [[graft.functions.ShingleHashes]] (60-bit md5-prefix convention,
    * shared bit-for-bit with the DuckDB oracle — identical to
    * string-distinct up to a negligible 60-bit collision); the total is
    * closed-form from the token count, so no shingle strings are ever
    * materialized. [[repetitionPpmBuiltin]] is the string-exact SPEC. */
  def repetitionPpm(text: Column, k: Int): Column = {
    val total = greatest(tokenCount(text) - lit(k - 1L), lit(1L))
    val distinct = size(ColumnShims.column(graft.functions.ShingleHashes(
      ColumnShims.expression(tokens(text)), k))).cast("long")
    intDiv((total - distinct) * lit(1000000L), total)
  }

  /** Builtin-composed string-exact SPEC of [[repetitionPpm]] (equality
    * asserted in DedupSpec; differs only on a 60-bit hash collision). */
  def repetitionPpmBuiltin(text: Column, k: Int): Column = {
    val sh = shingles(text, k)
    intDiv((size(sh) - size(array_distinct(sh))).cast("long") * lit(1000000L),
      size(sh).cast("long"))
  }

  /** Ratio of characters in the character SET `inner` (the BODY of a
    * regex character class — "A-Z", "0-9a-f" — NOT a bracketed or
    * negated class; negation/brackets would silently invert the count
    * when spliced into the [^...] complement below) in ppm of the text
    * length; empty/NULL text scores 0 (greatest(len, 1) guards the
    * division). ASCII-safe. */
  def charClassPpm(text: Column, inner: String): Column = {
    require(!inner.startsWith("[") && !inner.startsWith("^") && !inner.contains("]"),
      s"charClassPpm takes the class body (e.g. \"A-Z\"), not a bracketed/negated class: $inner")
    val t = coalesce(text, lit(""))
    intDiv(
      length(regexp_replace(t, s"[^$inner]", "")).cast("long") * lit(1000000L),
      greatest(length(t).cast("long"), lit(1L)))
  }

  /** Uppercase-character ratio (ppm) — quality signal for shouty or
    * header-heavy text. */
  def upperPpm(text: Column): Column = charClassPpm(text, "A-Z")

  /** Deterministic hash bucket in [0, buckets) from a key column — the
    * primitive behind reproducible train/val/test splits and
    * downsampling: the assignment depends only on the key (stable
    * across runs, engines, and cluster layouts), never on row order or
    * partitioning. Buckets must be <= 2^24 so the 8-hex-digit md5
    * prefix is uniform over them. */
  /** PII patterns for [[redactPii]] / [[piiCount]] — deliberately
    * conservative character-class regexes with identical semantics
    * under Java regex (Spark) and RE2 (DuckDB): no lookaround, no
    * backreferences, no engine-specific classes. Order matters:
    * emails are replaced FIRST so their dotted domains can never be
    * re-matched by the IP pattern; phones (dashes) and IPs (dots) are
    * disjoint by construction. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\d{3}-\\d{3}-\\d{4}", "<PHONE>"),
    ("\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "<IP>"))

  /** `text` with every email / phone / IPv4 match replaced by its tag
    * — the standard pre-training scrub step. A narrow codegen'd
    * projection: no shuffle, no UDF. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(coalesce(text, lit(""))) { case (c, (re, tag)) =>
      regexp_replace(c, lit(re), lit(tag))
    }

  /** Number of PII matches in `text` (counted BEFORE any replacement,
    * on the same patterns). */
  def piiCount(text: Column): Column =
    PiiPatterns.map { case (re, _) => regexp_count(coalesce(text, lit("")), lit(re)) }
      .reduce(_ + _).cast("long")

  /** GPT-2-style byte-level PRE-TOKENIZATION base pattern (Radford et
    * al. 2019; the split every shipped byte-level BPE runs before any
    * merge is applied): contraction suffixes, then space-attached
    * letter runs, digit runs and symbol runs, then whitespace runs —
    * so a leading space travels WITH its word (the space-inside-token
    * convention) and letters never merge across a letter/digit/symbol
    * category change.
    *
    * The shipped pattern's `\\s+(?!\\S)` alternative (leave the LAST
    * char of a multi-whitespace run to attach to the next token) is a
    * lookahead RE2 cannot express; the base pattern keeps each
    * whitespace run as ONE piece and [[pretokenize]] applies the
    * deterministic ATTACH transform ([[graft.functions.PretokRuntime]])
    * that reproduces the lookahead's splits exactly — the same
    * transform the DuckDB oracle replays as a lag/lead list transform
    * over this identical pattern. One deliberate, documented
    * divergence from the shipped pattern remains (docs/COMPAT.md §12),
    * in the PII-pattern playbook of "only constructs with identical
    * Java-regex (Spark) and RE2 (DuckDB oracle) semantics": `\\s` is
    * spelled as the explicit class `[ \\t\\n\\x0B\\f\\r]` — exactly
    * Python's core `[ \\t\\n\\v\\f\\r]`, identical in Java and RE2,
    * where neither engine's own `\\s` is (Java's lacks nothing but
    * RE2's lacks `\\x0B`) — so Unicode whitespace such as U+00A0,
    * which the shipped pattern's Python `\\s` also matches, splits as
    * a SYMBOL run here. */
  val PretokPattern: String = graft.functions.PretokRuntime.BasePattern

  /** `text` split into GPT-2-style pre-tokens: the [[PretokPattern]]
    * base split plus the multi-whitespace attach transform, as one
    * native codegen'd expression ([[graft.functions.PretokSplit]]) —
    * splits agree with the SHIPPED lookahead pattern everywhere
    * outside COMPAT §12's two character-class divergences (spec'd,
    * fixture + randomized). Every character lands in exactly one
    * piece, so `concat(pieces) == text` (spec'd). */
  def pretokenize(text: Column): Column =
    ColumnShims.column(graft.functions.PretokSplit(
      ColumnShims.expression(coalesce(text, lit("")))))

  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0 && buckets <= (1 << 24), "buckets must be in [1, 2^24]")
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets
  }

  /** Split label from cumulative ppm thresholds over [[hashBucket]]
    * (e.g. train/val/test at 800000/900000 ppm of 1e6 buckets):
    * the label is thresholds.last's name for the tail. */
  def splitLabel(key: Column, cuts: Seq[(String, Long)]): Column = {
    require(cuts.nonEmpty, "at least one split")
    val his = cuts.map(_._2)
    require(his == his.sorted && his.forall(h => h > 0 && h <= 1000000L),
      s"split thresholds must be ascending in (0, 1e6]: $his " +
        "(an out-of-order cut would silently receive zero rows)")
    val b = hashBucket(key, 1000000)
    cuts.init.foldRight(lit(cuts.last._1)) { case ((name, hi), rest) =>
      when(b < hi, lit(name)).otherwise(rest)
    }
  }

  /** Digit-character ratio (ppm) — quality signal for tabular/serial
    * content. */
  def digitPpm(text: Column): Column = charClassPpm(text, "0-9")

  /** Winnowing-style document fingerprint: the minimum md5 over the
    * document's k-shingle rolling windows. Robust to local edits, cheap
    * (one narrow pass), and directly comparable across engines. Uses
    * the one-pass native expression
    * [[graft.functions.ShingleMinMd5]] — no shingle-string
    * materialization, no interpreted per-shingle lambda. */
  def shingleFingerprint(text: Column, k: Int): Column =
    ColumnShims.column(graft.functions.ShingleMinMd5(
      ColumnShims.expression(tokens(text)), k))

  /** Builtin-composed executable SPEC of [[shingleFingerprint]]
    * (equality asserted in DedupSpec). */
  def shingleFingerprintBuiltin(text: Column, k: Int): Column =
    array_min(transform(shingles(text, k), s => md5(s.cast("binary"))))

  /** Builtin-composed executable SPEC of
    * [[graft.functions.WinnowAnchors]] (equality asserted in
    * DedupSpec): 0-based shingle offset i is an anchor iff its 60-bit
    * hash is the strict minimum of some FULL w-window of shingle
    * positions — enumerated here as: exists a + b = w - 1 with the
    * window [i-a, i+b] inside the doc, every hash in [i-a, i-1] and
    * [i+1, i+b] strictly greater than h(i). */
  def winnowAnchorsBuiltin(text: Column, k: Int, w: Int): Column = {
    val hs = transform(shingles(text, k),
      s => conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long"))
    filter(sequence(lit(0), size(hs) - 1), i => {
      val hi = element_at(hs, i + 1)
      val m = size(hs)
      (0 until w).map { a =>
        val b = w - 1 - a
        val leftOk =
          if (a == 0) lit(true)
          else when(i >= a, array_min(slice(hs, i - lit(a - 1), lit(a))) > hi)
            .otherwise(lit(false))
        val rightOk =
          if (b == 0) lit(true)
          else when(i + b <= m - 1, array_min(slice(hs, i + 2, lit(b))) > hi)
            .otherwise(lit(false))
        leftOk && rightOk
      }.reduce(_ || _)
    })
  }
}
