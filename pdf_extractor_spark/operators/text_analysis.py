"""Text-analysis operators over the `documents` table (training-data pipeline).

Every operator is expressed with built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen; no Python in the hot path) and has an exact ANSI-SQL
twin in __spark_entry__.oracle_sql, so the driver's DuckDB value-hash gate
applies. Pure-Python reference implementations live in kernels/textstats.py.

Scale: all of these are narrow per-row projections over the scan — no
shuffle at all except the final aggregates, which do map-side partial
aggregation. They pipeline over 100 TB with zero exchange for the per-doc
variants.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extractor_spark.kernels.textstats import EN_STOPWORDS_SMALL, TOKEN_RE


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _norm(col):
    """lower + collapse whitespace (kernels/textstats.normalize twin)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish token counts per document."""
    norm = _norm(F.col("text"))
    return docs.select(
        "doc_id",
        F.when(norm == "", 0)
        .otherwise(F.size(F.split(norm, " ")))
        .alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)).alias("bpe_tokens"),
        F.length("text").alias("chars"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Composite quality heuristic, mirrored in SQL (textstats.quality_score).

    0.5*min(ws_tokens,100)/100 + 0.3*(1-punct_ratio) + 0.2*min(stop_ratio*5,1)

    Arrow-batched kernel (replaced an interpreted per-token×per-stopword
    array_contains scan, ~2.5× slower at bench scale). Two parity details:
    the punct regex is written as explicit ASCII [a-zA-Z0-9_] because Java's
    \\w (Spark, oracle) is ASCII-only while Python's \\w is Unicode; and all
    ratios leave the kernel unrounded — the divisions are IEEE-identical to
    the JVM's, and F.round applies JVM-side so the oracle hash matches
    exactly.
    """
    import re

    import pandas as pd

    # re.ASCII: Java/RE2 \s is ASCII-only; Python's Unicode \s would also
    # match NBSP/U+2028 and diverge from the JVM twin on non-ASCII docs
    ws_re = re.compile(r"\s+", re.ASCII)
    word_re = re.compile(r"[a-zA-Z0-9_]")
    sw = frozenset(EN_STOPWORDS_SMALL)

    def kernel(batches):
        for pdf in batches:
            ws_tokens, punct_ratio, stop_ratio, quality = [], [], [], []
            for text in pdf["text"]:
                text = text or ""
                norm = ws_re.sub(" ", text.lower()).strip()
                toks = norm.split(" ") if norm else []
                nt = len(toks)
                squeezed = ws_re.sub("", text)
                pr = (
                    (len(squeezed) - len(word_re.findall(squeezed))) / len(squeezed)
                    if squeezed
                    else 0.0
                )
                sr = sum(1 for t in toks if t in sw) / nt if nt else 0.0
                q = 0.5 * (min(nt, 100) / 100.0) + 0.3 * (1.0 - pr) + 0.2 * min(sr * 5.0, 1.0)
                ws_tokens.append(nt)
                punct_ratio.append(pr)
                stop_ratio.append(sr)
                quality.append(q)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ws_tokens": ws_tokens,
                    "punct_ratio": punct_ratio,
                    "stop_ratio": stop_ratio,
                    "quality": quality,
                }
            )

    from pdf_extractor_spark.operators.dedup import _widen

    raw = _widen(docs.select("doc_id", "text")).mapInPandas(
        kernel,
        "doc_id long, ws_tokens int, punct_ratio double, stop_ratio double, quality double",
    )
    return raw.select(
        "doc_id",
        "ws_tokens",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stop_ratio", 6).alias("stop_ratio"),
        F.round("quality", 6).alias("quality"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """md5-of-normalized-text document fingerprint (exact-dedup key)."""
    return docs.select("doc_id", F.md5(_norm(F.col("text"))).alias("fp"))


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-profile language ID (kernels/lang.detect_lang twin).

    Scores each language by stopword-hit fraction over whitespace tokens;
    ties break to the lexicographically smallest language; no hits → 'und'.

    Arrow-batched kernel (mapInPandas → frozenset lookups): replaced a
    JVM formulation doing one interpreted array_contains scan per
    (token × language × stopword) — set lookups are O(1) and ~25× faster at
    bench scale. Values are unchanged (same scoring), so the DuckDB
    stopword-SQL oracle still matches.
    """
    import pandas as pd

    from pdf_extractor_spark.kernels.lang import detect_lang

    def kernel(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "detected_lang": [detect_lang(t or "") for t in pdf["text"]],
                }
            )

    from pdf_extractor_spark.operators.dedup import _widen

    return _widen(docs.select("doc_id", "lang", "text")).mapInPandas(
        kernel, "doc_id long, lang string, detected_lang string"
    )


def language_agreement(docs: DataFrame) -> DataFrame:
    """Rate at which detected language agrees with the table's lang hint.

    agree_rate goes through decimal(18,6) (not a rounded double): the
    int/int division is one IEEE op so both engines compute the identical
    double, and the decimal cast makes the stored value exact — double
    `round` ULP behavior differs between engines and broke the driver's
    value hash in round 1 (CORRECTNESS_r01 q16). The final double cast
    keeps the client dtype float64 on both engines (Spark's pandas bridge
    renders decimal as Decimal objects, DuckDB's as float64); the
    decimal→double conversion is one deterministic round-to-nearest.
    """
    d = lang_id(docs)
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.when(F.col("detected_lang") == F.col("lang"), 1).otherwise(0)).alias(
                "agree"
            ),
        )
        .withColumn(
            "agree_rate",
            (F.col("agree") / F.col("docs")).cast("decimal(18,6)").cast("double"),
        )
        .orderBy("lang")
    )


def char_minhash_fingerprints(docs: DataFrame, k: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: the minimum md5 over ALL k-char
    substrings of the normalized text (a 1-fingerprint degenerate winnowing;
    kernels/textstats.rolling_hashes is the pure-Python rolling-hash twin).

    Robust to edits outside the minimizing window — unlike the whole-text
    md5 of `fingerprints` — while staying exactly SQL-expressible for the
    oracle. JVM-side: transform over a position sequence + array_min; one
    scan, no shuffle.
    """
    norm = _norm(F.col("text"))
    npos = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), npos), lambda i: F.md5(F.substr(norm, i, F.lit(k)))
    )
    return docs.select("doc_id", F.array_min(grams).alias("fp")).orderBy("doc_id")


def split_marked_pages(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Explode `PAGE n:`-marked content into per-page rows (kernel twin
    kernels/pagesplit.split_pages — reference llamaparse.py:137-222 parity:
    marker regex, then \\n---\\n fallback, then whole-text page 1).

    Arrow kernel + flat output rows; narrow map, no shuffle.
    """
    import pandas as pd

    from pdf_extractor_spark.kernels.pagesplit import split_pages

    key_cols = [c for c in df.columns if c != content_col]

    def kernel(batches):
        for pdf in batches:
            rows = {c: [] for c in key_cols}
            pn, pt = [], []
            for i, content in enumerate(pdf[content_col]):
                for num, text in split_pages(content if content is not None else ""):
                    for c in key_cols:
                        rows[c].append(pdf[c].iloc[i])
                    pn.append(num)
                    pt.append(text)
            rows["page_number"] = pn
            rows["page_text"] = pt
            yield pd.DataFrame(rows)

    key_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema
                           if f.name != content_col)
    return df.mapInPandas(kernel, f"{key_schema}, page_number int, page_text string")


def term_doc_freq(docs: DataFrame, min_df: int = 10, top_n: int = 50) -> DataFrame:
    """Corpus vocabulary by document frequency: distinct tokens per doc,
    exploded and counted. One shuffle on the token (map-side partial
    aggregation); `min_df`/`top_n` bound the result at any corpus size."""
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(_norm(F.col("text")), " "))).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where((F.col("df") >= min_df) & (F.col("token") != ""))
        .orderBy(F.col("df").desc(), F.col("token"))
        .limit(top_n)
    )


def stratified_split(docs: DataFrame, train_pct: int = 90) -> DataFrame:
    """Deterministic train/val assignment by content-independent key hash:
    split = 'train' iff md5(doc_id) mod 100 < train_pct. Hash-based (not
    random) so the split is reproducible, stable under re-runs, and
    consistent across tables keyed by the same id — the standard
    training-data discipline. Narrow projection, no shuffle."""
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(100),
    )
    return docs.withColumn(
        "split", F.when(bucket < train_pct, "train").otherwise("val")
    )


# default blocklist for the C4 badwords gate: spam/scam terms in the
# same family as the URL-quality gate's blocklist (webtext.py); real
# deployments pass their full curated list
C4_BADWORD_TERMS = ("casino", "viagra", "free money", "lottery winner")


def badwords_hits(docs: DataFrame,
                  terms: tuple[str, ...] = C4_BADWORD_TERMS) -> DataFrame:
    """(doc_id, bad_hits): occurrences of blocklist terms over the
    normalized token stream — WORD-BOUNDARY exact (C4 §2.2 removes any
    page containing a blocklist word; substring matching would flag
    'scunthorpe'-style false positives). Tokens are the normalized
    stream with punctuation stripped (so 'money,' matches 'money' the
    way a \\b-anchored regex would, while 'freemoney' stays one clean
    token). Single- and two-word terms match against the unigram and
    bigram streams respectively.

    Plan shape: a pure-JVM expression — tokens + constructed bigrams
    filtered against the literal term arrays, zero Python, zero shuffle,
    zero explode; pipelines into whatever consumes it at any corpus
    size. The literal-array scan is O(|terms|) per token, the right
    trade below a few thousand terms; for curated lists beyond that,
    join the exploded token stream against a broadcast terms table
    instead (the robots-rules discipline).

    Terms must already be in matchable form — lowercase a-z0-9 words,
    at most two of them (the streams constructed here). Anything else
    raises ValueError up front: silently dropping a blocklist entry
    would quietly disable part of a safety gate (real C4 lists carry
    3+-word phrases; extend to a trigram stream before passing them)."""
    import re as _re

    bad = [t for t in terms
           if t.count(" ") > 1 or not _re.fullmatch(r"[a-z0-9]+( [a-z0-9]+)?", t)]
    if bad:
        raise ValueError(
            f"badwords_hits: unsupported terms {bad!r} — only lowercase "
            "1- or 2-word a-z0-9 terms match the token streams here")
    uni = tuple(t for t in terms if " " not in t)
    bi = tuple(t for t in terms if t.count(" ") == 1)
    depunct = F.trim(F.regexp_replace(
        F.regexp_replace(_norm(F.col("text")), "[^a-z0-9 ]", ""),
        " +", " "))
    toks = F.split(depunct, " ")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    uni_lit = F.array(*[F.lit(t) for t in uni]) if uni else None
    bi_lit = F.array(*[F.lit(t) for t in bi]) if bi else None
    hits = F.lit(0)
    if uni:
        hits = hits + F.size(F.filter(toks, lambda t: F.array_contains(uni_lit, t)))
    if bi:
        hits = hits + F.size(F.filter(bigrams,
                                      lambda g: F.array_contains(bi_lit, g)))
    return docs.select("doc_id", hits.cast("long").alias("bad_hits"))


def c4_style_pipeline(docs: DataFrame, min_tokens: int = 20, min_quality: float = 0.5,
                      boiler_max_df: int = 50,
                      badword_terms: tuple[str, ...] | None = None) -> DataFrame:
    """The classic web-corpus cleaning pipeline in one composed plan:
    line-frequency boilerplate removal → quality/length gate → exact dedup
    (keep min doc_id per normalized-text group) → per-language survivor
    counts. Each stage is one of this engine's operators; the composition
    stays lazy so Catalyst pipelines the narrow stages between the three
    unavoidable shuffles (line-df aggregate, dedup group, final rollup).

    ``badword_terms`` adds the C4 §2.2 blocklist gate (Raffel et al.
    2020: drop any page with a blocklist term) as a SECOND reported
    stage: rows tagged ``c4`` are the base pipeline, rows tagged
    ``c4_badwords`` the survivors after additionally dropping documents
    with any word-boundary blocklist hit. The gate expression itself is
    zero-shuffle JVM, and because Catalyst does not dedupe common
    subplans (the q46-fanout / training_mix discipline), the narrow
    (doc_id, lang) survivor frame is persisted so the two stage rollups
    share ONE execution of the strip→gate→dedup subtree; the cache
    handle rides on the result as ``_persisted_gate``
    (frontier_release)."""
    from pdf_extractor_spark.operators.dedup import line_frequency_dedup

    cleaned = line_frequency_dedup(docs, max_df=boiler_max_df).withColumnRenamed(
        "clean_text", "text"
    )
    cleaned = cleaned.join(docs.select("doc_id", "lang"), "doc_id")
    q = quality_scores(cleaned).select("doc_id", "ws_tokens", "quality")
    gated = (
        cleaned.join(q, "doc_id")
        .where((F.col("ws_tokens") >= min_tokens) & (F.col("quality") >= min_quality))
    )
    fp = F.md5(_norm(F.col("text"))).alias("fp")
    ranked = gated.select("doc_id", fp)
    keep = ranked.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    survivors = gated.join(keep, "doc_id", "left_semi")

    def rollup(d: DataFrame, stage: str) -> DataFrame:
        out = d.groupBy("lang").agg(F.count("*").alias("survivors"))
        if badword_terms is None:
            return out
        return out.withColumn("stage", F.lit(stage))

    if badword_terms is None:
        return rollup(survivors, "c4").orderBy("lang")
    # both stage rollups consume this narrow frame — persist it or the
    # whole strip→gate→dedup subtree executes twice in the unioned plan
    surv = survivors.select("doc_id", "lang").persist()
    # gate on the ORIGINAL text (C4 drops the page wholesale; the
    # boilerplate strip must not un-flag a page whose bad term sat in a
    # stripped line)
    clean_ids = badwords_hits(docs, badword_terms).where(
        F.col("bad_hits") == 0).select("doc_id")
    result = rollup(surv, "c4").unionByName(
        rollup(surv.join(clean_ids, "doc_id"), "c4_badwords")
    ).orderBy("stage", "lang")
    result._persisted_gate = surv  # release handle (frontier_release)
    return result


def chunk_documents(docs: DataFrame, chunk_tokens: int = 128, overlap: int = 16) -> DataFrame:
    """Token-window chunking with overlap — the LLM-training prep step that
    turns cleaned documents into model-sized pieces. Stride = chunk - overlap;
    the final window is emitted iff it starts inside the text (standard
    sliding-window semantics). JVM-side: one split + one transform over a
    stride sequence; zero shuffle, pipelines over any corpus size.
    """
    stride = chunk_tokens - overlap
    norm = _norm(F.col("text"))
    # split('') is [''] — an empty doc has ZERO tokens, not one phantom ''
    toks = F.when(norm == "", F.array().cast("array<string>")) \
        .otherwise(F.split(norm, " "))
    n = F.size(toks)
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
        ),
    )
    return (
        docs.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.size(F.split(F.col("c.chunk_text"), " ")).alias("n_tokens"),
        )
    )


def winnowing_fingerprints(docs: DataFrame, k: int = 8, window: int = 4) -> DataFrame:
    """True winnowing (Schleimer/Wilkerson/Aiken): Rabin-Karp rolling hashes
    over k-char grams of the normalized text, then the minimum hash per
    sliding window of `window` grams, deduplicated — the document's
    fingerprint set for plagiarism-style local matching. Arrow kernel over
    kernels/textstats.rolling_hashes (the twin the unit tests pin);
    numpy sliding-window-min. Non-SQL-expressible (rolling recurrence) →
    rows-only driver check; exactness is pinned by the kernel twin tests.
    """
    import pandas as pd

    from pdf_extractor_spark.kernels.textstats import winnow_fingerprint_set
    from pdf_extractor_spark.operators.dedup import _widen

    def kernel(batches):
        for pdf in batches:
            fps, nfp = [], []
            for text in pdf["text"]:
                text = text or ""
                # comma-joined string (not array<long>): the external
                # driver's canonicalizer cannot hash list cells
                # (CORRECTNESS_r01 q48 harness crash). The helper is the
                # single source of truth shared with the q48 literal oracle.
                s, n = winnow_fingerprint_set(text, k=k, window=window)
                fps.append(s)
                nfp.append(n)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "fingerprints": fps, "n_fp": nfp}
            )

    return _widen(docs.select("doc_id", "text")).mapInPandas(
        kernel, "doc_id long, fingerprints string, n_fp int"
    )


def gopher_quality(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition/quality signals per document (Rae et al. 2021,
    "Scaling Language Models", §A1.1 repetition filters — public paper).

    Per doc over normalized whitespace tokens:
      n_words          token count
      mean_word_len    mean characters per token
      top_bigram_frac  chars covered by the most-repeated word 2-gram
                       (max over bigrams of count*len(gram) / len(norm), ≤1)
      dup_trigram_frac chars covered by word 3-grams occurring >1 time
                       (sum of count*len(gram) / len(norm), capped at 1)
      keep             the gate: 50 ≤ n_words, 3 ≤ mean_word_len ≤ 10,
                       top_bigram_frac ≤ 0.20, dup_trigram_frac ≤ 0.30

    Arrow-batched Counter kernel (per-token work is the slow path for
    interpreted JVM HOFs); divisions leave the kernel unrounded so F.round
    JVM-side matches the DuckDB oracle bit-exactly. Scale: narrow per-row
    projection, no shuffle — pipelines over any corpus size.
    """
    import pandas as pd

    from pdf_extractor_spark.kernels.textstats import gopher_doc_stats

    def kernel(batches):
        for pdf in batches:
            n_words, mwl, topbg, duptg = [], [], [], []
            for text in pdf["text"]:
                text = text or ""
                n, m, t, d = gopher_doc_stats(text)
                n_words.append(n)
                mwl.append(m)
                topbg.append(t)
                duptg.append(d)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": n_words,
                    "mean_word_len": mwl,
                    "top_bigram_frac": topbg,
                    "dup_trigram_frac": duptg,
                }
            )

    from pdf_extractor_spark.operators.dedup import _widen

    raw = _widen(docs.select("doc_id", "text")).mapInPandas(
        kernel,
        "doc_id long, n_words int, mean_word_len double, "
        "top_bigram_frac double, dup_trigram_frac double",
    )
    return raw.select(
        "doc_id",
        "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
        F.round("dup_trigram_frac", 6).alias("dup_trigram_frac"),
        (
            (F.col("n_words") >= 50)
            & (F.col("mean_word_len") >= 3.0)
            & (F.col("mean_word_len") <= 10.0)
            & (F.col("top_bigram_frac") <= 0.20)
            & (F.col("dup_trigram_frac") <= 0.30)
        ).alias("keep"),
    )


# PII patterns: restricted to syntax valid in BOTH Java regex (Spark) and
# RE2 (DuckDB) — character classes, bounded repeats, \b word boundaries;
# no lookaround, no backrefs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
PII_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex PII scrubbing (training-data hygiene pass): emails → [EMAIL],
    phone numbers → [PHONE], IPv4 literals → [IP], with per-doc match counts
    taken from the original text. Pure JVM regexp_replace/regexp_extract_all
    — whole-stage codegen, zero shuffle, no Python in the hot path.

    Order matters and is fixed: emails first (an email must not first lose
    its host to the IP rule), then IPs, then phones.
    """
    t = F.col(text_col)
    clean = F.regexp_replace(t, PII_EMAIL_RE, "[EMAIL]")
    clean = F.regexp_replace(clean, PII_IP_RE, "[IP]")
    clean = F.regexp_replace(clean, PII_PHONE_RE, "[PHONE]")
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE_RE), 0)).alias("n_phones"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IP_RE), 0)).alias("n_ips"),
    )


def tf_table(docs: DataFrame, store_root: str) -> DataFrame:
    """Materialized (doc_id, term, tf) table (SnapshotTable) keyed by corpus
    count+crc32 checksum (stale-content-safe, see dedup._corpus_key): the tokenize+count pass is the expensive shared input of both the
    ranking side and the document-frequency aggregate, and at 100 TB an
    executor-cache persist of it is a multi-TB residency dependency — the
    same discipline as dedup.shingle_table."""
    from pdf_extractor_spark.sources.table_format import SnapshotTable

    from pdf_extractor_spark.operators.dedup import _corpus_key

    t = SnapshotTable(store_root)
    key = {"n_docs": _corpus_key(docs)}
    m = t.current_manifest()
    if m is not None and m.get("summary", {}).get("key") == key:
        return t.read(docs.sparkSession)
    toks = docs.select(
        "doc_id", F.explode(F.split(_norm(F.col("text")), " ")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    t.overwrite(tf, summary={"key": key})
    return t.read(docs.sparkSession)


def tfidf_topk(docs: DataFrame, k: int = 3, tf_store: str | None = None) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    tf = term count within the doc (normalized whitespace tokens);
    df = number of docs containing the term; score = tf * ln((N+1)/(df+1)).
    Ranking is by (tf DESC, df ASC, term ASC) — an integer-only ordering
    (monotone in the score for fixed doc) so the window ranking cannot be
    perturbed by last-ulp log differences across engines; the rounded score
    is reported alongside.

    Plan: explode tokens → (doc, term) counts [shuffle 1] → term df
    aggregate [shuffle 2, map-side partial] → broadcast-able df join →
    per-doc window top-k. At 100 TB the df table is vocabulary-sized
    (tiny vs corpus) and broadcasts.
    """
    from pyspark.sql import Window

    # share the tf aggregate: both the ranking side and the document-
    # frequency aggregate consume it, and without sharing Catalyst re-scans
    # and re-explodes the whole corpus for the df branch (verified in the
    # formatted plan) — at 100 TB that doubles the tokenize work. Sharing is
    # either executor cache (.persist(), default) or — the scale path — a
    # committed SnapshotTable reused across runs (tf_store, see tf_table).
    if tf_store is not None:
        tf = tf_table(docs, tf_store)
    else:
        toks = docs.select(
            "doc_id", F.explode(F.split(_norm(F.col("text")), " ")).alias("term")
        ).where(F.col("term") != "")
        tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).persist()
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.count()  # one cheap count job; a literal in the plan
    # rank by the ACTUAL score (lexicographic (tf, -df) is NOT monotone in
    # tf*ln((N+1)/(df+1)) and can drop a doc's most characteristic term);
    # the sort key is the same 6dp-snapped value the result emits — already
    # value-hash-gated, so ordering on it adds no new cross-engine risk
    scored = tf.join(F.broadcast(df), "term").withColumn(
        "tfidf",
        F.round(
            F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)), 6
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "rank", "tfidf")
        .orderBy("doc_id", "rank")
    )


def source_rollup(docs: DataFrame) -> DataFrame:
    """Per-source corpus rollup (the Common-Crawl host-level stats table):
    doc count, char volume, language diversity, dominant language
    (deterministic: max count, ties to the lexicographically first lang),
    and language-distribution entropy (nats). Two narrow shuffles —
    (source, lang) counts, then per-source aggregate; both do map-side
    partial aggregation and the result is host-cardinality (tiny).
    """
    from pyspark.sql import Window

    by_lang = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("chars")
    )
    p = F.col("n") / F.sum("n").over(Window.partitionBy("source"))
    by_lang = by_lang.withColumn("p", p)
    return (
        by_lang.groupBy("source")
        .agg(
            F.sum("n").alias("docs"),
            F.sum("chars").alias("total_chars"),
            F.round(F.sum("chars") / F.sum("n"), 6).alias("avg_chars"),
            F.count("*").alias("n_langs"),
            F.min(F.struct((-F.col("n")).alias("negn"), F.col("lang").alias("lang")))[
                "lang"
            ].alias("top_lang"),
            F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 6).alias("lang_entropy"),
        )
        .orderBy("source")
    )


def corpus_top_ngrams(docs: DataFrame, n: int = 3, k: int = 20) -> DataFrame:
    """Corpus-wide top-k word n-grams with multiplicity (the n-gram count
    table of a Common-Crawl-style corpus). The gram build is one JVM
    transform over a stride sequence (no Python, no shuffle); the count is
    one shuffle with map-side partial aggregation; the global top-k runs as
    TakeOrderedAndProject (per-partition heaps, no full sort). Deterministic
    order: count DESC, gram ASC."""
    toks = F.split(_norm(F.col("text")), " ")
    n_grams = F.size(toks) - (n - 1)
    # guard: sequence(1, 0) would generate a DESCENDING [1, 0] in Spark
    grams = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(grams).alias("gram"))
        .where(F.col("gram") != "")
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("gram"))
        .limit(k)
    )


def _word_freq_table(docs: DataFrame) -> DataFrame:
    """(word, freq) over normalized whitespace tokens — the vocabulary-
    sized table BPE learning iterates over (corpus-sized text collapses to
    vocab-sized rows in ONE aggregate; every later pass is over the vocab,
    the standard trick that makes iterative BPE viable at corpus scale)."""
    return (
        docs.select(F.explode(F.split(_norm(F.col("text")), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("freq"))
    )


def bpe_learn_merges(docs: DataFrame, n_merges: int = 8,
                     min_count: int = 2,
                     words: DataFrame | None = None,
                     vocab_cap: int | None = None,
                     ) -> list[tuple[int, str, str, int]]:
    """Distributed BPE merge learning (Sennrich et al. 2016): greedily
    learn `n_merges` subword merges from the corpus, each step picking the
    most frequent adjacent symbol pair (weighted by word frequency;
    deterministic tie-break count DESC, then pair ASC). Returns
    [(rank, left, right, weighted_count), ...].

    Plan per step: the persisted (word, freq) vocabulary table → one Arrow
    kernel re-segmenting each word under the merges learned so far (shared
    bpe_apply_merges — also the twin's function) and emitting adjacent
    pairs → one count aggregate → TakeOrdered(1) to the driver. Driver
    state is just the merge list (like k-means centroids / classifier
    weights). All arithmetic is integer and all ordering is code-point
    (== UTF-8 binary) — exactly replicable by the pure-Python twin with no
    decimal contract needed.

    At 100 TB: the word-freq aggregate is the only corpus-sized pass;
    each of the n_merges steps touches only the vocabulary table.

    `vocab_cap` (round-2 verdict item 5 — sublinear driver round-trips):
    the production path. The top-`vocab_cap` vocabulary rows by
    (freq DESC, word ASC) are collected ONCE (driver state bounded by the
    cap, like k-means centroids) and ALL merges are learned locally via
    the shared kernels.textstats.bpe_learn_from_vocab — zero per-merge
    Spark jobs, so n_merges=256 or 32k costs one aggregate + one bounded
    collect instead of n_merges job round-trips. This is what
    SentencePiece/HF trainers do: the corpus-sized pass is the word-freq
    aggregate; merge learning is vocabulary-local. When the cap exceeds
    the true vocabulary the result is IDENTICAL to the uncapped
    distributed path (same greedy rule, same tie-breaks, shared
    segmentation function)."""
    from pdf_extractor_spark.kernels.textstats import (
        bpe_apply_merges, bpe_learn_from_vocab,
    )

    own_words = words is None
    if vocab_cap is not None:
        wdf = words if words is not None else _word_freq_table(docs)
        top = (
            wdf.orderBy(F.col("freq").desc(), "word")
            .limit(int(vocab_cap)).collect()
        )
        return bpe_learn_from_vocab(
            [(r["word"], int(r["freq"])) for r in top], n_merges, min_count)
    if own_words:
        words = _word_freq_table(docs).persist()
    merges: list[tuple[str, str]] = []
    learned: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        frozen = tuple(merges)

        def kern(batches, _m=frozen):
            import pandas as pd

            mlist = list(_m)
            for pdf in batches:
                a_l, b_l, f_l = [], [], []
                for w, f in zip(pdf["word"], pdf["freq"]):
                    syms = bpe_apply_merges(w, mlist)
                    for i in range(len(syms) - 1):
                        a_l.append(syms[i])
                        b_l.append(syms[i + 1])
                        f_l.append(f)
                yield pd.DataFrame({"a": a_l, "b": b_l, "freq": f_l})

        top = (
            words.mapInPandas(kern, "a string, b string, freq long")
            .groupBy("a", "b").agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1).collect()
        )
        if not top or int(top[0]["cnt"]) < min_count:
            break
        r = top[0]
        merges.append((r["a"], r["b"]))
        learned.append((step + 1, r["a"], r["b"], int(r["cnt"])))
    if own_words:
        words.unpersist()
    return learned


def bpe_token_counts(docs: DataFrame, merges: list[tuple[str, str]],
                     k: int = 20,
                     words: DataFrame | None = None) -> DataFrame:
    """(token, cnt): corpus subword-token counts under learned BPE merges,
    top-k (count DESC, token ASC) — the distributed APPLICATION pass of the
    learned vocabulary (what a tokenization job runs over the full corpus).
    One Arrow segmentation kernel over the vocab table, one aggregate,
    TakeOrdered top-k."""
    from pdf_extractor_spark.kernels.textstats import bpe_apply_merges

    frozen = tuple(merges)

    def kern(batches, _m=frozen):
        import pandas as pd

        mlist = list(_m)
        for pdf in batches:
            t_l, f_l = [], []
            for w, f in zip(pdf["word"], pdf["freq"]):
                for s in bpe_apply_merges(w, mlist):
                    t_l.append(s)
                    f_l.append(f)
            yield pd.DataFrame({"token": t_l, "freq": f_l})

    if words is None:
        words = _word_freq_table(docs)
    return (
        words
        .mapInPandas(kern, "token string, freq long")
        .groupBy("token").agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(k)
    )


def _bpe_twin(texts: list[str | None], n_merges: int = 8,
              min_count: int = 2, k: int = 20):
    """Pure-Python twin of bpe_learn_merges + bpe_token_counts (exact
    integer/string work; shares bpe_apply_merges, bpe_learn_from_vocab and
    normalize with the Spark kernels). Returns (learned, top_tokens) where
    learned = [(rank, a, b, cnt)] and top_tokens = [(token, cnt, rank)]."""
    from collections import Counter

    from pdf_extractor_spark.kernels.textstats import (
        bpe_apply_merges, bpe_learn_from_vocab, normalize,
    )

    wf: Counter = Counter()
    for t in texts:
        if t is None:
            continue
        for w in normalize(t).split(" "):
            if w:
                wf[w] += 1
    # learning: the SAME shared function the Spark capped-vocab path calls
    learned = bpe_learn_from_vocab(wf, n_merges, min_count)
    merges = [(a, b) for _, a, b, _ in learned]
    tc: Counter = Counter()
    for w, f in wf.items():
        for s in bpe_apply_merges(w, merges):
            tc[s] += f
    top = sorted(tc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return learned, [(t, c, i + 1) for i, (t, c) in enumerate(top)]


def bpe_vocab_and_map(docs: DataFrame, n_merges: int = 16,
                      min_count: int = 2, vocab_cap: int = 65536,
                      ) -> tuple[list[tuple[str, str]],
                                 dict[str, list[int]], dict[str, int]]:
    """Learn BPE merges (capped-vocab path: one corpus-sized word-freq
    aggregate + one bounded collect — see bpe_learn_merges) and derive the
    deterministic token-id table: every subword token reachable by
    segmenting the collected vocabulary, ids assigned by code-point order
    (token ASC → 0..V-1, the canonical-ordering trick every twin in this
    repo uses instead of engine-dependent insertion order). Returns
    (merges, word → [token ids], token → id) — the driver-side model
    state of a tokenizer job (vocab-bounded, like k-means centroids /
    robots rules), broadcast into the encode kernel. The token→id table
    rides along so callers never re-segment the vocabulary to
    reconstruct it (review-wave finding)."""
    from pdf_extractor_spark.kernels.textstats import (
        bpe_apply_merges, bpe_learn_from_vocab,
    )

    top = (
        _word_freq_table(docs)
        .orderBy(F.col("freq").desc(), "word")
        .limit(int(vocab_cap)).collect()
    )
    wf = [(r["word"], int(r["freq"])) for r in top]
    learned = bpe_learn_from_vocab(wf, n_merges, min_count)
    merges = [(a, b) for _, a, b, _ in learned]
    seg = {w: bpe_apply_merges(w, merges) for w, _ in wf}
    tok_ids = {t: i for i, t in
               enumerate(sorted({s for ss in seg.values() for s in ss}))}
    return (merges,
            {w: [tok_ids[s] for s in ss] for w, ss in seg.items()},
            tok_ids)


def bpe_encode_pack(docs: DataFrame, n_merges: int = 16,
                    min_count: int = 2, vocab_cap: int = 65536,
                    seq_tokens: int = 128, bucket: int = 1024) -> DataFrame:
    """The end-to-end tokenization deliverable of an LLM-data pipeline:
    learn a BPE vocabulary from the corpus, ENCODE every document to token
    ids, and pack the global id stream into fixed-length training
    sequences — corpus text in, model-ready (seq_id, ids) out. Returns
    (seq_id, n_docs, n_tokens, seq_text) where seq_text is the
    space-joined decimal ids (string-rendered so the packing core, the
    value hash, and the SQL twin all operate on one portable encoding).

    Plan: one corpus-sized word-freq aggregate + one vocab-bounded collect
    (bpe_vocab_and_map) → the word→ids map rides the Arrow-kernel closure
    to every partition (vocab-sized broadcast, like robots rules) → one
    mapInArrow-style pandas pass encodes docs (per-word dict lookup;
    unseen-beyond-cap words segment on the fly via the SAME shared
    bpe_apply_merges, tokens outside the vocab map to id -1, the
    documented UNK) → the shared distributed-prefix-sum packing core
    (_pack_token_stream). At 100 TB the only corpus-sized stages are the
    word-freq aggregate and the encode map pass — both shuffle-free until
    the keyed pack shuffles.
    """
    from pdf_extractor_spark.kernels.textstats import (
        bpe_apply_merges, normalize,
    )

    merges, wmap, tok_ids = bpe_vocab_and_map(
        docs, n_merges, min_count, vocab_cap)
    frozen_m = tuple(merges)
    frozen_map = dict(wmap)

    def kern(batches, _m=frozen_m, _map=frozen_map, _tid=tok_ids,
             _bucket=bucket):
        import pandas as pd

        mlist = list(_m)

        def enc(doc_text):
            if doc_text is None:
                return []
            out = []
            for w in normalize(doc_text).split(" "):
                if not w:
                    continue
                ids = _map.get(w)
                if ids is None:
                    ids = [_tid.get(s, -1) for s in bpe_apply_merges(w, mlist)]
                out.extend(ids)
            return out

        for pdf in batches:
            ids_col = [enc(t) for t in pdf["text"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "toks": [[str(i) for i in ids] for ids in ids_col],
                "n": [len(ids) for ids in ids_col],
                "bkt": [int(d) // _bucket for d in pdf["doc_id"]],
            })

    t = docs.select("doc_id", "text").mapInPandas(
        kern, "doc_id long, toks array<string>, n long, bkt long")
    return _pack_token_stream(t, seq_tokens)


def _bpe_encode_map_twin(texts: list[str | None], n_merges: int = 16,
                         min_count: int = 2, vocab_cap: int = 65536,
                         ) -> list[tuple[str, str]]:
    """Pure-Python twin of :func:`bpe_vocab_and_map` for the q47 oracle:
    relearns merges from the corpus texts and returns the word → ids map
    as [(word, 'id id id')] rows (sorted by word) to pin as SQL VALUES —
    the vocab-bounded model state; the corpus-scale reassembly/packing is
    recomputed independently in SQL. Covers EVERY distinct corpus word:
    words beyond the vocab cap are segmented on the fly and unknown
    tokens map to -1 — exactly the engine kernel's enc() fallback, so
    the oracle's map join never silently drops a word and shifts every
    later packing offset (review-wave finding). Shares
    bpe_learn_from_vocab / bpe_apply_merges / normalize with the Spark
    side (zero fork)."""
    from collections import Counter

    from pdf_extractor_spark.kernels.textstats import (
        bpe_apply_merges, bpe_learn_from_vocab, normalize,
    )

    wf: Counter = Counter()
    for t in texts:
        if t is None:
            continue
        for w in normalize(t).split(" "):
            if w:
                wf[w] += 1
    top = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_cap]
    learned = bpe_learn_from_vocab(top, n_merges, min_count)
    merges = [(a, b) for _, a, b, _ in learned]
    seg = {w: bpe_apply_merges(w, merges) for w, _ in top}
    tok_ids = {t: i for i, t in
               enumerate(sorted({s for ss in seg.values() for s in ss}))}
    out = {w: [tok_ids[s] for s in ss] for w, ss in seg.items()}
    for w in wf:
        if w not in out:  # beyond-cap: the kernel's on-the-fly fallback
            out[w] = [tok_ids.get(s, -1) for s in bpe_apply_merges(w, merges)]
    return sorted(
        (w, " ".join(str(i) for i in ids)) for w, ids in out.items())


def stratified_sample(docs: DataFrame, rates: dict[str, int] | None = None,
                      default_rate: int = 50) -> DataFrame:
    """Deterministic per-stratum downsampling (the data-mixture step of a
    training pipeline: keep X% of each language/quality stratum). Assignment
    is by content-independent key hash — md5(doc_id) mod 100 < rate — so the
    sample is reproducible, stable under re-runs, and consistent with
    stratified_split's bucketing. Narrow projection, zero shuffle.
    """
    rates = rates if rates is not None else {"en": 100, "zh": 25}
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(100),
    )
    rate = F.lit(default_rate)
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, r).otherwise(rate)
    return docs.select("doc_id", "lang", bucket.alias("bucket"),
                       rate.alias("rate")).where(F.col("bucket") < F.col("rate"))


def doc_metrics(docs: DataFrame) -> DataFrame:
    """Per-document feature suite in one oracle-gated result: token counts,
    quality scores, language ID, Gopher repetition gates, plus the
    deterministic train/val split and stratified-sample assignment — the
    former q12/q13/q15/q50/q44/q57 at per-doc grain.

    One FUSED Arrow kernel normalizes/tokenizes each document once and
    emits every text metric (the standalone operators each re-tokenize;
    fusing measured ~2× at bench scale), then the hash-based split/sample
    assignment lands as JVM projections on the same rows — one scan, zero
    joins, pipelines at any corpus size. Values are computed with the
    exact same per-metric code paths as the standalone operators, so the
    composed oracle is unchanged.
    """
    import re
    from collections import Counter

    import pandas as pd

    from pdf_extractor_spark.kernels.lang import detect_lang
    from pdf_extractor_spark.kernels.textstats import _TOKEN_RE_C, normalize
    from pdf_extractor_spark.operators.dedup import _widen

    ws_re = re.compile(r"\s+", re.ASCII)
    word_re = re.compile(r"[a-zA-Z0-9_]")
    sw = frozenset(EN_STOPWORDS_SMALL)

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "lang", "ws_tokens", "bpe_tokens", "chars",
                "punct_ratio", "stop_ratio", "quality", "detected_lang",
                "mean_word_len", "top_bigram_frac", "dup_trigram_frac",
            )}
            for did, lang, text in zip(pdf["doc_id"], pdf["lang"], pdf["text"]):
                text = text or ""
                norm = normalize(text)
                toks = norm.split(" ") if norm else []
                nt = len(toks)
                nchars = len(norm)
                # token counts (q12 twin)
                out["doc_id"].append(did)
                out["lang"].append(lang)
                out["ws_tokens"].append(nt)
                out["bpe_tokens"].append(len(_TOKEN_RE_C.findall(text)))
                out["chars"].append(len(text))
                # quality (q13 twin — identical arithmetic)
                squeezed = ws_re.sub("", text)
                pr = (
                    (len(squeezed) - len(word_re.findall(squeezed))) / len(squeezed)
                    if squeezed
                    else 0.0
                )
                sr = sum(1 for t in toks if t in sw) / nt if nt else 0.0
                out["punct_ratio"].append(pr)
                out["stop_ratio"].append(sr)
                out["quality"].append(
                    0.5 * (min(nt, 100) / 100.0) + 0.3 * (1.0 - pr)
                    + 0.2 * min(sr * 5.0, 1.0)
                )
                # language ID (q15 twin)
                out["detected_lang"].append(detect_lang(text))
                # Gopher signals (q50 twin — identical arithmetic)
                out["mean_word_len"].append(sum(map(len, toks)) / nt if nt else 0.0)
                if nt >= 2 and nchars:
                    bg = Counter(zip(toks, toks[1:]))
                    top = max(c * (len(a) + len(b) + 1) for (a, b), c in bg.items())
                    out["top_bigram_frac"].append(min(1.0, top / nchars))
                else:
                    out["top_bigram_frac"].append(0.0)
                if nt >= 3 and nchars:
                    tg = Counter(zip(toks, toks[1:], toks[2:]))
                    dup = sum(
                        c * (len(a) + len(b) + len(g) + 2)
                        for (a, b, g), c in tg.items()
                        if c > 1
                    )
                    out["dup_trigram_frac"].append(min(1.0, dup / nchars))
                else:
                    out["dup_trigram_frac"].append(0.0)
            yield pd.DataFrame(out)

    raw = _widen(docs.select("doc_id", "lang", "text")).mapInPandas(
        kernel,
        "doc_id long, lang string, ws_tokens int, bpe_tokens int, chars int, "
        "punct_ratio double, stop_ratio double, quality double, "
        "detected_lang string, mean_word_len double, top_bigram_frac double, "
        "dup_trigram_frac double",
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(100),
    )
    rate = F.when(F.col("lang") == "en", 100).when(
        F.col("lang") == "zh", 25).otherwise(50)
    sampled = bucket < rate
    return raw.select(
        "doc_id",
        "ws_tokens",
        "bpe_tokens",
        "chars",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stop_ratio", 6).alias("stop_ratio"),
        F.round("quality", 6).alias("quality"),
        "lang",
        "detected_lang",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
        F.round("dup_trigram_frac", 6).alias("dup_trigram_frac"),
        (
            # gate on the UNROUNDED stats — gopher_quality, the shared
            # kernel gopher_keep, and the SQL twin all do; gating on the
            # 6dp display values would disagree at rounding boundaries
            (F.col("ws_tokens") >= 50)
            & (F.col("mean_word_len") >= 3.0)
            & (F.col("mean_word_len") <= 10.0)
            & (F.col("top_bigram_frac") <= 0.20)
            & (F.col("dup_trigram_frac") <= 0.30)
        ).alias("keep"),
        F.when(bucket < 90, "train").otherwise("val").alias("split"),
        F.when(sampled, bucket).alias("bucket"),
        F.when(sampled, rate).alias("rate"),
        sampled.alias("sampled"),
    ).orderBy("doc_id")


def fingerprint_suite(docs: DataFrame) -> DataFrame:
    """Whole-text md5 fingerprint + winnowing-style char-minhash fingerprint
    per document (former q14+q34), one narrow join on doc_id."""
    fp = fingerprints(docs)
    cm = char_minhash_fingerprints(docs).withColumnRenamed("fp", "char_fp")
    return fp.join(cm, "doc_id").orderBy("doc_id")


def lm_perplexity_buckets(docs: DataFrame, model_docs: DataFrame | None = None,
                          alpha: float = 1.0,
                          approx_terciles: bool = False) -> DataFrame:
    """CCNet-style language-model quality bucketing (Wenzek et al. 2019
    §4.3): score each document by the perplexity of a smoothed word-bigram
    LM and split each language into head/middle/tail terciles — the
    canonical corpus-quality partition used to weight training mixtures.
    CCNet scores with a Wikipedia-trained KenLM; the deterministic stand-in
    here trains add-α bigram counts on `model_docs` (default: the corpus
    itself, a self-scoring pass).

    Plan: model bigram/context counts are two hash aggregates on the gram
    key; document bigrams join those counts (one shuffle on gram — in
    production the LM corpus is curated and Wikipedia-sized, so both count
    tables broadcast and the scoring pass is shuffle-free); per-doc
    log-probs sum as decimal(20,10) so the aggregate is exact and
    order-independent (double summation order across partitions is
    nondeterministic — the same snap discipline as q49/q16). Perplexity
    exp(-avg_lp) snaps through decimal(18,6) for cross-engine hash
    stability. Tercile assignment is ntile(3) per language over the snapped
    value — rank-based, so exactly SQL-mirrorable; at 100 TB you'd replace
    the per-language global sort with approx-percentile cutpoints
    (two-pass, broadcastable), trading exactness of the tercile boundary
    only — that is exactly what ``approx_terciles=True`` does: one
    `percentile_approx` aggregate per language (constant-size state per
    partition, lang-cardinality result broadcast back), so no
    per-language sort ever happens. Bucket boundaries then sit on VALUE
    cutpoints instead of exact rank thirds: ties and boundary docs can
    land one bucket over vs ntile, nothing else changes (tested:
    value-monotone buckets, high agreement with the exact path). The
    default stays the rank-exact path because the DuckDB oracle mirrors
    ntile.

    Output: (doc_id, lang, ppl, bucket); docs with <2 tokens score ppl=1.
    """
    from pyspark.sql import Window

    model = model_docs if model_docs is not None else docs

    def bigrams(col_toks):
        return F.transform(
            F.sequence(F.lit(0), F.size(col_toks) - 2),
            lambda i: F.concat_ws(" ", F.get(col_toks, i), F.get(col_toks, i + 1)),
        )

    mt = model.select(F.split(_norm(F.col("text")), " ").alias("toks"))
    mbig = mt.where(F.size("toks") >= 2).select(
        F.explode(bigrams(F.col("toks"))).alias("gram")
    )
    cb = mbig.groupBy("gram").agg(F.count("*").alias("c_bg"))
    cw = (
        mbig.select(F.substring_index("gram", " ", 1).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c_w"))
    )
    vocab = mt.select(F.explode("toks").alias("w")).agg(
        F.countDistinct("w").alias("vsz")
    )

    t = docs.select(
        "doc_id", "lang", F.split(_norm(F.col("text")), " ").alias("toks")
    )
    big = t.where(F.size("toks") >= 2).select(
        "doc_id", F.explode(bigrams(F.col("toks"))).alias("gram")
    )
    lp = F.log(
        (F.coalesce("c_bg", F.lit(0)) + F.lit(alpha))
        / (F.coalesce("c_w", F.lit(0)) + F.lit(alpha) * F.col("vsz"))
    ).cast("decimal(20,10)")
    scored = (
        big.join(cb, "gram", "left")
        .withColumn("w1", F.substring_index("gram", " ", 1))
        .join(cw, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(F.sum(lp).alias("s"), F.count("*").alias("m"))
    )
    ppl = (
        t.select("doc_id", "lang")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.exp(
                -(
                    F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                    / F.coalesce("m", F.lit(1))
                )
            )
            .cast("decimal(18,6)")
            .cast("double")
            .alias("ppl"),
        )
    )
    if approx_terciles:
        # the 100 TB arm: lang-cardinality cutpoint table via one
        # constant-memory sketch aggregate, broadcast back — no sort
        return ppl.join(F.broadcast(_approx_tercile_cuts(ppl)), "lang") \
            .select("doc_id", "lang", "ppl",
                    _approx_tercile_bucket().alias("bucket"))
    w = Window.partitionBy("lang").orderBy("ppl", "doc_id")
    return ppl.select(
        "doc_id",
        "lang",
        "ppl",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            F.ntile(3).over(w),
        ).alias("bucket"),
    )


def _approx_tercile_cuts(ppl: DataFrame) -> DataFrame:
    """(lang, cuts[2]) tercile cutpoints via ONE percentile_approx
    aggregate — the sort-free scale path. At accuracy 100k over exact
    retained samples Spark returns the order statistic at rank
    ceil(q·n), which DuckDB reproduces with the identical double
    arithmetic (both 1/3 and 2/3 doubles under-approximate the exact
    fractions, so the ceil is stable even when n is a multiple of 3) —
    what lets the q62 approx stage carry a full value-hash oracle."""
    return ppl.groupBy("lang").agg(
        F.percentile_approx(
            "ppl", F.array(F.lit(1.0 / 3), F.lit(2.0 / 3)),
            F.lit(100_000)).alias("cuts"))


def _approx_tercile_bucket():
    """Bucket expression over a frame joined with _approx_tercile_cuts —
    ONE definition shared by lm_perplexity_buckets(approx_terciles=True)
    and training_mix_pipeline's approx stage."""
    return (
        F.when(F.col("ppl") <= F.element_at("cuts", 1), F.lit("head"))
        .when(F.col("ppl") <= F.element_at("cuts", 2), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )


def _hashed_gram_stream(d: DataFrame, n_buckets: int, *extra: str) -> DataFrame:
    """(*extra, bucket) rows: one row per word uni+bigram of the normalized
    text, hashed to md5-hex-mod-n_buckets — the shared hashed-bag-of-ngrams
    featurizer for DSIR importance weights and the quality classifier (the
    same portable bucket primitive as stratified_sample)."""
    toks = F.split(_norm(F.col("text")), " ")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )
    return d.select(
        *extra, F.explode(F.concat(toks, bigrams)).alias("gram")
    ).select(*extra, bucket.alias("bucket"))


def dsir_weights(docs: DataFrame, target_docs: DataFrame | None = None,
                 n_buckets: int = 1024, alpha: float = 1.0,
                 gram_store: str | None = None,
                 corpus_key: str | None = None) -> DataFrame:
    """DSIR hashed n-gram importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): featurize
    each document as hashed word uni+bigram counts, fit bag-of-words
    distributions over the hash buckets for a target corpus and the raw
    corpus, and score each document by its log importance ratio
    Σ_g ln(p_target(b(g)) / p_raw(b(g))) — positive means the document
    looks more like the target than like the average raw page.

    Plan: both distributions are ONE hash aggregate each over the exploded
    gram stream, collapsed to `n_buckets` rows — so the stats tables are
    constant-size (1024 rows here) and BROADCAST back onto the per-doc gram
    stream regardless of corpus size; the per-doc sum is one aggregate
    keyed by doc_id. Hashing is md5-hex mod B (the same portable bucket
    primitive as stratified_sample), log terms snap through decimal(20,10)
    so the per-doc sum is exact and order-independent, and the output
    weight snaps to decimal(18,6) for cross-engine hash stability.

    Default target: the corpus's `lang = 'en'` slice (self-referential
    stand-in for the paper's curated target, e.g. Wikipedia+books).
    Output: (doc_id, dsir_weight); docs with no grams weigh 0.
    """
    def gram_stream(d: DataFrame, *extra):
        return _hashed_gram_stream(d, n_buckets, *extra)

    # ONE shared corpus-wide gram stream feeds all three consumers (raw
    # distribution, default-target distribution, per-doc scoring) — without
    # sharing, the tokenize+md5 explode (the dominant cost) runs 3x; the
    # tfidf/shingle discipline applied here. An explicit target corpus
    # still streams separately (it is not derivable from the raw stream).
    # Sharing medium (round-2 advice): `gram_store` routes the stream
    # through a SnapshotTable — the 100 TB path, where a .persist() of the
    # exploded gram stream is a multi-TB executor-cache residency that
    # lives for the session. Without a store we keep .persist(): the cache
    # cannot be unpersisted here because the returned plan is lazy (the
    # three consumers only hit the cache when the CALLER runs an action) —
    # acceptable at test/bench scale, pass gram_store at corpus scale.
    if gram_store is not None:
        from pdf_extractor_spark.operators.dedup import _corpus_key
        from pdf_extractor_spark.sources.table_format import SnapshotTable

        t = SnapshotTable(gram_store)
        key = {"n_docs": corpus_key if corpus_key is not None
               else _corpus_key(docs), "b": n_buckets}
        m = t.current_manifest()
        if m is None or m.get("summary", {}).get("key") != key:
            t.overwrite(gram_stream(docs, "doc_id", "lang"),
                        summary={"key": key})
        stream = t.read(docs.sparkSession)
    else:
        stream = gram_stream(docs, "doc_id", "lang").persist()
    raw_b = stream.groupBy("bucket").agg(F.count("*").alias("r_b"))
    if target_docs is not None:
        tgt_b = gram_stream(target_docs).groupBy("bucket").agg(
            F.count("*").alias("t_b"))
    else:
        tgt_b = (stream.where(F.col("lang") == "en")
                 .groupBy("bucket").agg(F.count("*").alias("t_b")))
    raw_tot = raw_b.agg(F.sum("r_b").alias("r_tot"))
    tgt_tot = tgt_b.agg(F.sum("t_b").alias("t_tot"))

    ab = float(alpha * n_buckets)
    term = F.log(
        ((F.coalesce("t_b", F.lit(0)) + F.lit(alpha)) * (F.col("r_tot") + F.lit(ab)))
        / ((F.coalesce("r_b", F.lit(0)) + F.lit(alpha)) * (F.col("t_tot") + F.lit(ab)))
    ).cast("decimal(20,10)")
    scored = (
        stream
        .join(F.broadcast(raw_b), "bucket", "left")
        .join(F.broadcast(tgt_b), "bucket", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .groupBy("doc_id")
        .agg(F.sum(term).alias("s"))
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("s").cast("double"), F.lit(0.0))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("dsir_weight"),
    )


def _gram_stream_from_store(docs: DataFrame, n_buckets: int,
                            gram_store: str,
                            corpus_key: str | None = None) -> DataFrame | None:
    """Re-bucket the DSIR gram store's (doc_id, lang, bucket) stream to
    `n_buckets` when the store is fresh for this corpus AND its bucket
    count is a multiple of ours — md5-mod composes: for B | B_store,
    h % B == (h % B_store) % B, so the derived stream is bit-identical
    to hashing the corpus directly at B. Returns None on any miss (the
    caller computes fresh inline); never writes (read-through only —
    dsir_weights owns the store's lifecycle)."""
    from pdf_extractor_spark.operators.dedup import _corpus_key
    from pdf_extractor_spark.sources.table_format import SnapshotTable

    t = SnapshotTable(gram_store)
    m = t.current_manifest()
    key = (m or {}).get("summary", {}).get("key") or {}
    b_store = key.get("b")
    if corpus_key is None:
        corpus_key = _corpus_key(docs)
    if (key.get("n_docs") != corpus_key or not b_store
            or b_store % n_buckets != 0):
        return None
    return t.read(docs.sparkSession).select(
        "doc_id", F.pmod(F.col("bucket"), F.lit(n_buckets)).alias("bucket"))


def _qcls_features(docs: DataFrame, n_buckets: int,
                   gq: DataFrame, stream: DataFrame | None = None) -> DataFrame:
    """(doc_id, bucket, x) feature rows for the quality classifier:
    buckets [0, B) are hashed-gram term frequencies (cnt/n — length-
    invariant vocabulary evidence), buckets B..B+3 are the scaled Gopher
    structural signals (n_words capped at 200 /200, mean_word_len/10,
    top_bigram_frac, dup_trigram_frac — without these a tf-only linear
    model cannot express the length/repetition part of a quality gate),
    and bucket B+4 is the bias (x = 1). `gq` is a gopher_quality frame
    (its 6dp-rounded columns ARE the features, keeping the oracle twin's
    replication surface small). `stream` optionally substitutes an
    already-bucketed (doc_id, bucket) gram stream (see
    _gram_stream_from_store) for the inline tokenize+md5 explode."""
    if stream is None:
        stream = _hashed_gram_stream(
            docs.select("doc_id", "text"), n_buckets, "doc_id")
    counts = stream.groupBy("doc_id", "bucket").agg(F.count("*").alias("cnt"))
    ndf = counts.groupBy("doc_id").agg(F.sum("cnt").alias("n"))
    grams = counts.join(ndf, "doc_id").select(
        "doc_id", "bucket", (F.col("cnt") / F.col("n")).alias("x"))
    structs = gq.select(
        "doc_id",
        F.posexplode(F.array(
            F.least(F.col("n_words"), F.lit(200)) / F.lit(200.0),
            F.col("mean_word_len") / F.lit(10.0),
            F.col("top_bigram_frac"),
            F.col("dup_trigram_frac"),
            F.lit(1.0),
        )),
    ).select(
        "doc_id",
        (F.lit(n_buckets) + F.col("pos")).cast("long").alias("bucket"),
        F.col("col").alias("x"),
    )
    return grams.unionByName(structs)


def quality_classifier_train(docs: DataFrame, n_buckets: int = 256,
                             iters: int = 4, lr: float = 1.0) -> list[float]:
    """Distributed trainer for a fastText-style linear quality classifier
    (the CCNet/FineWeb-edu pattern: a cheap linear model over hashed
    bag-of-ngram + structural features, distilled from a more expensive
    quality signal — here the Gopher rule gate supplies the labels
    y ∈ {0,1}). Returns B+5 weights (see _qcls_features).

    Full-batch logistic-regression gradient descent, every step expressed
    as Spark aggregates: per iteration (1) per-doc logit = Σ_b w_b·x_b via
    a broadcast join of the (B+5)-row weight table onto the persisted
    (doc_id, bucket, x) feature table + one decimal-snapped aggregate,
    (2) per-doc residual σ(logit)−y in an Arrow kernel (plain math.exp so
    the pure-Python twin is the same libm call), (3) per-bucket gradient =
    one more decimal-snapped aggregate collapsed to B+5 rows collected
    driver-side, (4) Adagrad update in plain driver-side float ops
    (per-bucket adaptive steps condition the mixed tf/structural feature
    scales — plain GD needs ~4× the iterations, i.e. ~4× the Spark jobs,
    for the same separation).

    Scale shape: the ONLY corpus-sized state is the feature table (persist
    it once, reuse across iterations); everything crossing the driver is
    B+5 doubles per iteration. Shuffles per iter: two aggregates over
    bucket-collapsed rows. 100 TB-safe by construction.

    Bit-exact replication contract (mirrors kmeans_centroids): every
    per-row term double-computes as w*x (resp. coeff*x), snaps through
    CAST(.. AS DECIMAL(30,15)) == Decimal(repr(x)).quantize(1e-15,
    HALF_UP), sums exactly (order-free), and re-enters float via float().
    σ runs in CPython math.exp on both sides. Trained weights therefore
    equal _quality_classifier_twin's bit-for-bit, which is what lets the
    oracle pin them as SQL literals.
    """
    feats = _qcls_labeled_features(docs, n_buckets).persist()
    w = _qcls_gd_loop(feats, n_buckets + 5, iters, lr)
    feats.unpersist()
    return w


def _qcls_labeled_features(docs: DataFrame, n_buckets: int,
                           gq: DataFrame | None = None,
                           stream: DataFrame | None = None) -> DataFrame:
    """(doc_id, bucket, x, y): classifier features joined with the Gopher
    gate labels. `gq`/`stream` share prebuilt inputs (see
    quality_classifier)."""
    if gq is None:
        gq = gopher_quality(docs)
    return _qcls_features(docs, n_buckets, gq, stream=stream).join(
        gq.select("doc_id", F.col("keep").cast("int").alias("y")), "doc_id")


def _qcls_gd_loop(feats: DataFrame, dim: int, iters: int,
                  lr: float) -> list[float]:
    """The Adagrad full-batch GD loop over a (persisted) labeled feature
    table — see quality_classifier_train for the plan + replication
    contract."""
    import math

    from pdf_extractor_spark.kernels.textstats import sigmoid

    spark = feats.sparkSession
    n_docs = feats.select("doc_id").distinct().count()
    if n_docs == 0:
        return [0.0] * dim

    def coeff_kern(batches):
        import pandas as pd

        for pdf in batches:
            out = [
                sigmoid(float(dot)) - int(y)
                for dot, y in zip(pdf["dot"], pdf["y"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "coeff": out})

    w = [0.0] * dim
    h = [0.0] * dim
    for _ in range(iters):
        wdf = spark.createDataFrame(
            list(enumerate(w)), "bucket long, w double")
        term = (F.col("w") * F.col("x")).cast("decimal(30,15)")
        dots = (
            feats.join(F.broadcast(wdf), "bucket")
            .groupBy("doc_id")
            .agg(F.sum(term).alias("dot"), F.first("y").alias("y"))
        )
        coeffs = dots.mapInPandas(coeff_kern, "doc_id long, coeff double")
        gterm = (F.col("coeff") * F.col("x")).cast("decimal(30,15)")
        grows = (
            feats.join(coeffs, "doc_id")
            .groupBy("bucket").agg(F.sum(gterm).alias("g"))
            .collect()
        )
        gmap = {int(r["bucket"]): float(r["g"]) for r in grows}
        for b in range(dim):
            g = gmap.get(b, 0.0) / n_docs
            h[b] += g * g
            w[b] -= lr * g / (math.sqrt(h[b]) + 1e-8)
    return w


def _qcls_score(docs: DataFrame, feats: DataFrame, w: list[float],
                checkpoint: bool = False) -> DataFrame:
    """(doc_id, logit, pred) from a feature table + trained weights — the
    SINGLE copy of the scoring contract (broadcast weight join, decimal
    dot, 6dp logit snap, pred = logit > 0) shared by quality_classifier
    and quality_classifier_scores so the twin/oracle parity surface cannot
    fork. With checkpoint=True the per-doc dot table is materialized
    eagerly (localCheckpoint — narrow (doc_id, decimal) rows), letting the
    caller release a persisted feature table immediately."""
    wdf = docs.sparkSession.createDataFrame(
        list(enumerate(w)), "bucket long, w double")
    term = (F.col("w") * F.col("x")).cast("decimal(30,15)")
    dots = (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy("doc_id").agg(F.sum(term).alias("s"))
    )
    if checkpoint:
        dots = dots.localCheckpoint()
    logit = (
        F.coalesce(F.col("s").cast("double"), F.lit(0.0))
        .cast("decimal(18,6)").cast("double")
    )
    return docs.select("doc_id").join(dots, "doc_id", "left").select(
        "doc_id", logit.alias("logit"), (logit > 0).alias("pred"))


def quality_classifier(docs: DataFrame, n_buckets: int = 256,
                       iters: int = 4, lr: float = 1.0,
                       weight_store: str | None = None,
                       gq: DataFrame | None = None,
                       gram_store: str | None = None,
                       corpus_key: str | None = None) -> DataFrame:
    """Train the hashed quality classifier AND score the corpus from ONE
    shared persisted feature table (one gopher pass + one gram pass
    total): (doc_id, logit, pred). Scoring checkpoints the narrow per-doc
    dot table so the corpus-sized feature cache is released before
    returning instead of leaking for the session lifetime.

    ``weight_store`` routes the trained weights through a committed MODEL
    STORE (SnapshotTable keyed by corpus checksum + hyperparameters — the
    kmeans_centroids_stored discipline): training runs once per corpus
    version and every later invocation scores with the stored B+5 weights
    (one feature pass + one broadcast join) instead of re-running
    ``iters`` GD rounds over the corpus. Training is deterministic
    (exact-decimal sums, libm sigmoid), so stored == retrained
    bit-for-bit and the literal-weight oracles are unchanged.

    Two optional pass-sharing hooks for composed pipelines (both
    bit-neutral — they substitute identical inputs, never change
    values): ``gq`` injects an already-built (typically persisted)
    gopher_quality frame so the structural features and labels reuse it
    instead of re-running the Gopher Arrow pass; ``gram_store``
    read-through-reuses the DSIR gram store's bucketed stream for the
    tf features when its bucket count is a multiple of ``n_buckets``
    (md5-mod composes — see _gram_stream_from_store)."""
    stream = (None if gram_store is None
              else _gram_stream_from_store(docs, n_buckets, gram_store,
                                           corpus_key=corpus_key))
    if weight_store is not None:
        w = _qcls_weights_from_store(docs, n_buckets, iters, lr,
                                     weight_store, corpus_key=corpus_key)
        if w is not None:
            return quality_classifier_scores(docs, w, n_buckets,
                                             gq=gq, stream=stream)
    feats = _qcls_labeled_features(docs, n_buckets, gq=gq,
                                   stream=stream).persist()
    w = _qcls_gd_loop(feats, n_buckets + 5, iters, lr)
    if weight_store is not None:
        _qcls_weights_to_store(docs, n_buckets, iters, lr, weight_store, w,
                               corpus_key=corpus_key)
    out = _qcls_score(docs, feats, w, checkpoint=True)
    feats.unpersist()
    return out


def _qcls_store_key(docs: DataFrame, n_buckets: int, iters: int,
                    lr: float, corpus_key: str | None = None) -> dict:
    from pdf_extractor_spark.operators.dedup import _corpus_key

    return {"corpus": corpus_key if corpus_key is not None
            else _corpus_key(docs),
            "b": n_buckets, "iters": iters, "lr": lr}


def _qcls_weights_from_store(docs: DataFrame, n_buckets: int, iters: int,
                             lr: float, store_root: str,
                             corpus_key: str | None = None) -> list[float] | None:
    """Stored classifier weights for this exact (corpus, hyperparams), or
    None on a store miss (first run / corpus changed)."""
    from pdf_extractor_spark.sources.table_format import SnapshotTable

    t = SnapshotTable(store_root)
    m = t.current_manifest()
    if m is None or m.get("summary", {}).get("key") != _qcls_store_key(
            docs, n_buckets, iters, lr, corpus_key=corpus_key):
        return None
    w = [0.0] * (n_buckets + 5)
    for r in t.read(docs.sparkSession).collect():
        w[r["i"]] = r["val"]
    return w


def _qcls_weights_to_store(docs: DataFrame, n_buckets: int, iters: int,
                           lr: float, store_root: str, w: list[float],
                           corpus_key: str | None = None) -> None:
    from pdf_extractor_spark.sources.table_format import SnapshotTable

    SnapshotTable(store_root).overwrite(
        docs.sparkSession.createDataFrame(
            [(i, float(v)) for i, v in enumerate(w)], "i int, val double"),
        summary={"key": _qcls_store_key(docs, n_buckets, iters, lr,
                                        corpus_key=corpus_key)})


def quality_classifier_scores(docs: DataFrame, w: list[float],
                              n_buckets: int = 256,
                              gq: DataFrame | None = None,
                              stream: DataFrame | None = None) -> DataFrame:
    """(doc_id, logit, pred): score every document with trained weights —
    one broadcast join of the (B+5)-row weight table onto the feature rows
    and one decimal-exact aggregate; logit snaps to decimal(18,6) for
    cross-engine hash stability, pred = logit > 0 (σ(logit) > 0.5).
    `gq`/`stream` share prebuilt inputs (see quality_classifier)."""
    return _qcls_score(
        docs,
        _qcls_features(docs, n_buckets,
                       gopher_quality(docs) if gq is None else gq,
                       stream=stream),
        w)


def _quality_classifier_twin(doc_rows: list[tuple[int, str | None]],
                             n_buckets: int = 256, iters: int = 4,
                             lr: float = 1.0) -> list[float]:
    """Bit-exact pure-Python twin of quality_classifier_train, used to pin
    the trained weights into the DuckDB oracle as literals (the
    kmeans/winnowing twin pattern). Shares gopher_doc_stats/gopher_keep/
    sigmoid with the Spark kernels; replicates the gram stream (normalize →
    split(' ') → uni+bigrams → md5-hex mod B), the structural features
    (over 6dp-half-up-rounded Gopher stats — what gopher_quality emits)
    and the decimal-snap summation contract documented on the trainer.
    Docs with null text are skipped — Spark's explode drops them from the
    feature table."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    from pdf_extractor_spark.kernels.textstats import (
        gopher_doc_stats, gopher_keep, normalize, sigmoid,
    )
    from pdf_extractor_spark.operators.multimodal import round_half_up

    q15 = Decimal("1e-15")

    def snap(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(q15, rounding=ROUND_HALF_UP)

    dim = n_buckets + 5
    prepped = []
    for did, text in doc_rows:
        if text is None:
            continue
        toks = normalize(text).split(" ")
        grams = list(toks)
        if len(toks) >= 2:
            grams += [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
        cnts: dict[int, int] = {}
        for g in grams:
            b = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
            cnts[b] = cnts.get(b, 0) + 1
        n = len(grams)
        feats: dict[int, float] = {b: c / n for b, c in cnts.items()}
        nw, mwl, topbg, duptg = gopher_doc_stats(text)
        feats[n_buckets] = min(nw, 200) / 200.0
        feats[n_buckets + 1] = round_half_up(mwl, 6) / 10.0
        feats[n_buckets + 2] = round_half_up(topbg, 6)
        feats[n_buckets + 3] = round_half_up(duptg, 6)
        feats[n_buckets + 4] = 1.0
        y = 1 if gopher_keep(nw, mwl, topbg, duptg) else 0
        prepped.append((feats, y))

    import math

    n_docs = len(prepped)
    if n_docs == 0:
        return [0.0] * dim
    w = [0.0] * dim
    h = [0.0] * dim
    for _ in range(iters):
        gsum: dict[int, Decimal] = {}
        for feats, y in prepped:
            dot = Decimal(0)
            for b, x in feats.items():
                dot += snap(w[b] * x)
            coeff = sigmoid(float(dot)) - y
            for b, x in feats.items():
                gsum[b] = gsum.get(b, Decimal(0)) + snap(coeff * x)
        for b in range(dim):
            g = float(gsum.get(b, Decimal(0))) / n_docs
            h[b] += g * g
            w[b] -= lr * g / (math.sqrt(h[b]) + 1e-8)
    return w


def temperature_mix_weight(count_col, part_window):
    """Temperature-scaled mixture weight w_i = c_i^0.7 / Σ c_j^0.7 over the
    window's partition (CCNet/RedPajama source weighting). Each pow term is
    decimal(18,6)-snapped BEFORE the sum so the cross-engine sum is
    order-free (the BM25 lesson), and the final value goes through the q16
    decimal→double bridge. SINGLE source of the formula — the SQL twin is
    temperature_mix_weight_sql; keep them in lockstep."""
    term = F.round(
        F.pow(count_col.cast("double"), F.lit(0.7)), 6
    ).cast("decimal(18,6)")
    return (
        F.round(
            term.cast("double")
            / F.sum(term).over(part_window).cast("double"),
            6,
        ).cast("decimal(18,6)").cast("double")
    )


def temperature_mix_weight_sql(count_sql: str, partition_by: str = "") -> str:
    """DuckDB expression twin of temperature_mix_weight (no alias)."""
    over = f"OVER (PARTITION BY {partition_by})" if partition_by else "OVER ()"
    term = f"CAST(round(pow({count_sql}, 0.7), 6) AS DECIMAL(18,6))"
    return (
        f"CAST(CAST(round(CAST({term} AS DOUBLE) / "
        f"CAST(sum({term}) {over} AS DOUBLE), 6) "
        f"AS DECIMAL(18,6)) AS DOUBLE)"
    )


def budget_epochs(weight_col, size_col, budget: int):
    """Per-source repetition factor to fill a training budget at the
    mixture weights: epochs_s = budget · w_s / size_s — the LLaMA/Pile
    'epochs per dataset' table (how many passes over a source its
    mixture share implies; >1 means the source repeats, the signal
    curators watch for memorization risk). Pure projection over an
    already-aggregated (weight, size) row; decimal-snapped via the q16
    bridge. A zero-size source reports 0.0 on BOTH sides (Spark's
    non-ANSI divide returns NULL there while DuckDB's IEEE double
    division returns inf and then fails the DECIMAL cast — the guard is
    what keeps the twins comparable). SQL twin: budget_epochs_sql —
    keep in lockstep."""
    raw = F.when(size_col == 0, F.lit(0.0)).otherwise(
        F.lit(float(budget)) * weight_col / size_col.cast("double"))
    return F.round(raw, 6).cast("decimal(18,6)").cast("double")


def budget_epochs_sql(weight_sql: str, size_sql: str, budget: int) -> str:
    """DuckDB expression twin of budget_epochs (no alias)."""
    return (
        f"CAST(CAST(round(coalesce({float(budget)} * ({weight_sql}) / "
        f"CAST(nullif({size_sql}, 0) AS DOUBLE), 0.0), 6) "
        f"AS DECIMAL(18,6)) AS DOUBLE)"
    )


def training_mix_pipeline(docs: DataFrame,
                          gram_store: str | None = None,
                          weight_store: str | None = None) -> DataFrame:
    """End-to-end training-data mixture prep composing this engine's
    hygiene operators. NOTE: not fully lazy — the classifier stage runs
    its distributed Adagrad training (a handful of Spark jobs) at plan-
    BUILD time, like every trained-geometry operator here (k-means IVF,
    BPE); the gate/sample/perplexity/DSIR stages stay lazy. Pass
    ``weight_store`` (see quality_classifier) to move that training
    behind a committed model store — train once per corpus version, every
    later call scores with the stored weights. Reported in
    three stages:
    `ccnet_mix` — Gopher repetition/quality gate → deterministic
    per-language stratified downsampling → CCNet perplexity terciles →
    mixture rollup per (language, quality bucket), the exact table CCNet's
    mixture weighting consumes. `dsir_selected` — the same rollup after
    additionally keeping only documents with positive DSIR log importance
    ratio against the en target (the deterministic selection variant of
    Xie et al. 2023's Gumbel resampling), showing how importance selection
    shifts the mixture. `qcls_selected` — the same rollup after keeping
    only documents the distributed-trained hashed logistic quality
    classifier scores positive (the CCNet/FineWeb pattern of a cheap
    linear model distilled from an expensive quality signal). Catalyst
    pipelines the narrow stages; the shuffles are the LM/DSIR/classifier
    count aggregates + gram joins (broadcast-scale stats) and the final
    rollups.

    The narrow gate∧sample∧perplexity frame is cached (all three stage
    rollups consume it); the handle rides on the result as
    ``result._persisted_gate`` — release with
    :func:`pdf_extractor_spark.operators.webtext.frontier_release` (or
    ``.unpersist()`` on the handle) once the mixture table has
    materialized, same contract as ``frontier_schedule``."""
    # ONE Gopher Arrow pass serves the gate, the classifier's structural
    # features, and (on a training run) the labels — the frame is narrow
    # (doc_id + a handful of 6dp doubles), persisted, released via the
    # result handle
    gq = gopher_quality(docs).persist()
    gate = gq.where(F.col("keep")).select("doc_id", "n_words")
    sampled = stratified_sample(docs).select("doc_id", "lang")
    # the LM frame is consumed TWICE — by the approx-tercile cutpoint
    # aggregate and by the per-doc bucket join below — and Catalyst does
    # not dedupe common subplans, so without this persist the bigram-LM
    # pipeline (gram joins + count aggregates) runs twice in the final
    # plan; the cached frame is narrow (doc_id, lang, ppl, bucket)
    pplf = lm_perplexity_buckets(docs).persist()
    # the approx-tercile bucket rides along in the SAME narrow frame (the
    # sort-free 100 TB bucketing arm, reported as its own stage) — one
    # extra broadcast join instead of a second LM pass + per-lang sort
    ppl = pplf.join(F.broadcast(_approx_tercile_cuts(pplf)), "lang").select(
        "doc_id", "bucket", _approx_tercile_bucket().alias("bucket_a"))
    # all four rollup stages consume this narrow (doc_id, lang, n_words,
    # bucket, bucket_a) frame (the q46 fanout discipline)
    kept = sampled.join(gate, "doc_id").join(ppl, "doc_id").persist()

    def rollup(d: DataFrame, stage: str) -> DataFrame:
        from pyspark.sql.window import Window

        return (
            d.groupBy("lang", "bucket")
            .agg(
                F.count("*").alias("survivors"),
                F.round(F.avg("n_words"), 6).alias("avg_words"),
            )
            .withColumn("stage", F.lit(stage))
            .withColumn(
                "mix_weight",
                temperature_mix_weight(
                    F.col("survivors"), Window.partitionBy()),
            )
        )

    # ONE corpus-key aggregate serves every store lookup below — each
    # helper would otherwise re-run its own eager count+crc32 corpus scan
    # at plan-build time (review finding, round 4)
    ckey = None
    if gram_store is not None or weight_store is not None:
        from pdf_extractor_spark.operators.dedup import _corpus_key

        ckey = _corpus_key(docs)
    selected = dsir_weights(docs, gram_store=gram_store,
                            corpus_key=ckey).where(
        F.col("dsir_weight") > 0).select("doc_id")
    # the classifier reuses the persisted Gopher frame AND (via md5-mod
    # composition, 256 | 1024) the gram stream dsir_weights just wrote to
    # the store — its scoring branch re-tokenizes nothing
    qcsel = quality_classifier(
        docs, weight_store=weight_store, gq=gq,
        gram_store=gram_store, corpus_key=ckey).where(
        F.col("pred")).select("doc_id")
    result = (
        rollup(kept, "ccnet_mix")
        .unionByName(rollup(
            kept.withColumn("bucket", F.col("bucket_a")),
            "approx_ccnet_mix"))
        .unionByName(rollup(kept.join(selected, "doc_id"), "dsir_selected"))
        .unionByName(rollup(kept.join(qcsel, "doc_id"), "qcls_selected"))
        .orderBy("stage", "lang", "bucket")
    )
    result._persisted_gate = kept  # release handles (see docstring)
    result._persisted_lm = pplf
    result._persisted_gq = gq
    return result


def pack_sequences(docs: DataFrame, seq_tokens: int = 128,
                   bucket: int = 1024) -> DataFrame:
    """GPT-style sequence packing: concatenate every document's tokens in
    doc_id order and cut the stream into fixed-length training sequences of
    `seq_tokens` tokens (sequences cross document boundaries; the final
    partial sequence is kept). The step after chunking/cleaning that turns
    a corpus into equal-length model inputs with zero padding waste.

    The global token offset of each document is a distributed prefix sum —
    the part a naive implementation gets wrong with a single-partition
    global window:
      1. per-doc token counts (scan-side, no shuffle);
      2. per-bucket subtotals (bucket = doc_id div `bucket`): one narrow
         aggregate whose output is corpus_size/bucket rows;
      3. cumulative bucket offsets via a window over the tiny subtotal
         table (recurse the same trick one level if even that overflows a
         partition at 1e12 docs);
      4. in-bucket running sum via a window PARTITIONED by bucket —
         bounded state, fully parallel.
    Each doc then explodes to only the sequences it overlaps (a doc of n
    tokens touches ceil(n/L)+1 sequences) and contributes its token slice;
    sequences reassemble with one groupBy(seq_id). Every shuffle is keyed
    (bucket or seq_id); no global sort, nothing driver-side.
    """
    norm = _norm(F.col("text"))
    # split('') is [''] — a phantom token would shift every later doc's
    # global offset and inject '' pieces into packed sequences
    toks = F.when(norm == "", F.array().cast("array<string>")) \
        .otherwise(F.split(norm, " "))
    t = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).cast("long").alias("n"),
        F.expr(f"doc_id div {bucket}").alias("bkt"),
    )
    return _pack_token_stream(t, seq_tokens)


def shuffled_pack_sequences(docs: DataFrame, seq_tokens: int = 128,
                            salt: str = "s1") -> DataFrame:
    """Sequence packing in DETERMINISTIC SHUFFLED corpus order — the
    training-prep step after cleaning/dedup: a model must not see the
    corpus in crawl/doc_id order (per-source runs become curriculum
    artifacts), and the shuffle must be reproducible from a seed, not a
    ``rand()``. The global order is (md5(doc_id || salt) 32-bit prefix,
    doc_id) — a seeded pseudo-random permutation both engines compute
    identically.

    Plan shape: NO global sort. The order key packs into a composite
    long (key << 31 | doc_id), and the same two-level distributed prefix
    sum as :func:`pack_sequences` runs over it — buckets come from the
    key's high bits, so they are uniform by construction (hash keys are
    equidistributed; better-balanced than doc_id ranges under sparse or
    skewed id spaces). Bound: doc_id must fit 31 bits for the composite
    to stay collision-free in int64 — ENFORCED with a per-row
    raise_error (a silent wrap would reorder colliding ids
    nondeterministically); shuffle two id-range shards separately (or
    widen to decimal) past 2^31 ids."""
    norm = _norm(F.col("text"))
    toks = F.when(norm == "", F.array().cast("array<string>")) \
        .otherwise(F.split(norm, " "))
    key = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))),
            1, 8),
        16, 10).cast("long")
    bounded_id = F.when(
        (F.col("doc_id") >= 0) & (F.col("doc_id") < (1 << 31)),
        F.col("doc_id"),
    ).otherwise(F.raise_error(F.lit(
        "shuffled_pack_sequences: doc_id outside [0, 2^31) — shard the "
        "id range or widen the composite key")).cast("long"))
    synth = key * F.lit(1 << 31) + bounded_id
    t = docs.select(
        synth.alias("doc_id"),
        toks.alias("toks"),
        F.size(toks).cast("long").alias("n"),
        F.shiftright(synth, 53).alias("bkt"),  # key's high bits: ≤1024 buckets
    )
    return _pack_token_stream(t, seq_tokens)


def _pack_token_stream(t: DataFrame, seq_tokens: int) -> DataFrame:
    """Packing core shared by :func:`pack_sequences` (whitespace tokens)
    and :func:`bpe_encode_pack` (BPE token ids rendered as strings):
    ``t`` = (doc_id, toks array<string>, n long, bkt long) → fixed-length
    sequences (seq_id, n_docs, n_tokens, seq_text). Plan shape documented
    at pack_sequences (distributed two-level prefix sum; every shuffle
    keyed)."""
    from pyspark.sql.window import Window

    bt = t.groupBy("bkt").agg(F.sum("n").alias("bn"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = bt.select(
        "bkt", F.coalesce(F.sum("bn").over(wb), F.lit(0)).alias("boff")
    )
    wi = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        t.join(F.broadcast(boff), "bkt")
        .select(
            "doc_id", "toks", "n",
            (F.col("boff") + F.coalesce(F.sum("n").over(wi), F.lit(0)))
            .alias("s"),
        )
        .withColumn("e", F.col("s") + F.col("n"))
    )
    L = seq_tokens
    # n == 0 docs contribute no tokens and must join NO sequence — their
    # (s-1) div L membership range would otherwise emit one empty piece
    x = spans.where(F.col("n") > 0).select(
        "toks", "s", "e",
        F.explode(
            F.sequence(F.expr(f"s div {L}"), F.expr(f"(e - 1) div {L}"))
        ).alias("seq_id"),
    )
    piece_start = F.greatest(F.col("seq_id") * L, F.col("s"))
    piece_end = F.least((F.col("seq_id") + 1) * L, F.col("e"))
    p = x.select(
        "seq_id",
        F.col("s").alias("src_start"),
        F.slice(
            "toks",
            (piece_start - F.col("s") + 1).cast("int"),
            (piece_end - piece_start).cast("int"),
        ).alias("piece"),
    )
    pieces_sorted = F.transform(
        F.sort_array(F.collect_list(F.struct("src_start", "piece"))),
        lambda st: st.getField("piece"),
    )
    return (
        p.groupBy("seq_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size("piece")).cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.flatten(pieces_sorted)).alias("seq_text"),
        )
        .select("seq_id", "n_docs", "n_tokens", "seq_text")
    )


# fixed retrieval workload for the q52 bm25 arm: term lists over the
# synthetic corpus vocabulary (literal on both engines)
BM25_QUERIES: list[tuple[int, tuple[str, ...]]] = [
    (0, ("hash", "join")),
    (1, ("window", "stream", "spark")),
    (2, ("customer", "filter")),
]


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, tuple[str, ...]]] | None = None,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 retrieval over the inverted (doc, term, tf) index — the
    keyword-search side of training-data curation (targeted subset
    selection / nearest-query mining).

    score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene-style
    non-negative variant).

    Engine-exactness: each per-term contribution is rounded to 6dp and cast
    to DECIMAL(18,6) BEFORE the per-doc sum, so the score is an order-free
    decimal sum (double summation order can differ across engines; the
    per-term expression trees are mirrored 1:1 in the oracle). Ranking is
    (score DESC, doc_id ASC).

    Plan: query terms are literals (broadcast); tf ⋈ terms touches only
    posting lists of queried terms; df and dl aggregate map-side; avgdl is
    two scalar literals (sum/count). One window per query_id bounded by the
    matched posting size. The shared tf table comes in via `tf` (the q52
    suite passes the same persisted/stored tf the TF-IDF arm uses — one
    corpus tokenize, two retrieval operators).
    """
    from pyspark.sql import Window

    if queries is None:
        queries = BM25_QUERIES
    spark = docs.sparkSession
    if tf is None:
        toks = docs.select(
            "doc_id", F.explode(F.split(_norm(F.col("text")), " ")).alias("term")
        ).where(F.col("term") != "")
        tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = docs.count()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    total_row = dl.agg(F.sum("dl")).collect()[0][0]  # one scalar
    avgdl = float(total_row) / float(n_docs)
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in terms],
        "query_id int, term string",
    )
    matched = tf.join(F.broadcast(qterms), "term")
    dfx = matched.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        matched.join(F.broadcast(dfx), "term")
        .join(dl, "doc_id")
        .withColumn(
            "idf",
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "contrib",
            F.round(
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
                6,
            ).cast("decimal(18,6)"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.groupBy("query_id", "doc_id")
        .agg(
            F.sum("contrib").cast("decimal(18,6)").alias("score"),
            F.sum("tf").cast("long").alias("matched_tf"),
            F.count("*").cast("long").alias("matched_terms"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "matched_tf", "matched_terms", "rank",
                F.col("score").cast("double").alias("score"))
    )
