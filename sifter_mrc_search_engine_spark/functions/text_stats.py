"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — the per-document statistics a training-data
pipeline computes at corpus scale.

All pure Catalyst expressions (codegen, no Python), each with a DuckDB-SQL
twin. The quality heuristics mirror the reference's gates: minimum
paragraph length (parser_manager.py:43), cleaning-pipeline character
classes (preprocessor.py:204-207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyzer import tokenize_expr

#: tiny deterministic stopword lists for the lang-id heuristic
LANG_STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "los", "es"],
    "fr": ["le", "la", "les", "et", "des", "est", "une"],
}
_LANGS = sorted(LANG_STOPWORDS)  # deterministic tie order


def quality_flag_expr(text_col: str = "text"):
    """The is_quality gate as a single Column expression (codegen) —
    shared by :func:`quality_scores` and the one-pass corpus audit."""
    t = F.col(text_col)
    toks = tokenize_expr(text_col)
    n_chars = F.length(t)
    alnum = F.length(F.regexp_replace(t, "[^a-zA-Z0-9가-힣]", ""))
    raw_ratio = F.when(n_chars > 0, alnum / n_chars).otherwise(F.lit(0.0))
    return (n_chars >= 10) & (raw_ratio > 0.5) & (F.size(toks) >= 3)


def _lang_hit_exprs(text_col: str) -> dict:
    toks = tokenize_expr(text_col)
    return {
        lang: F.size(F.filter(toks, lambda x: x.isin(LANG_STOPWORDS[lang])))
        for lang in _LANGS
    }


def _argmax_pred(hits: dict):
    """(pred_lang, best_hits) from a lang -> hit-count Column mapping —
    first language alphabetically reaching the max wins. THE shared
    argmax: lang_id and pred_lang_expr must never diverge."""
    best = F.greatest(*[hits[lang] for lang in _LANGS])
    pred = None
    for lang in reversed(_LANGS):
        cond = hits[lang] == best
        pred = F.when(cond, F.lit(lang)).otherwise(pred) if pred is not None else F.lit(lang)
    return pred, best


def pred_lang_expr(text_col: str = "text"):
    """Predicted language as a single Column expression (stopword-hit
    argmax, alphabetical tie-break — same semantics as :func:`lang_id`)."""
    return _argmax_pred(_lang_hit_exprs(text_col))[0]


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, n_tokens, n_ws_tokens)`` — analyzer tokens + raw
    whitespace splits (the BPE-ish pre-count)."""
    return docs.select(
        "doc_id",
        F.size(tokenize_expr(text_col)).cast("long").alias("n_tokens"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("n_ws_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features:
    ``(doc_id, n_chars, n_tokens, mean_token_len, alnum_ratio,
    stopword_ratio, is_quality)``.

    is_quality mirrors the reference's MIN length gate (>=10 chars,
    parser_manager.py:43) plus alnum/stopword sanity bounds.
    """
    t = F.col(text_col)
    toks = tokenize_expr(text_col)
    n_chars = F.length(t)
    n_toks = F.size(toks)
    alnum = F.length(F.regexp_replace(t, "[^a-zA-Z0-9가-힣]", ""))
    sw = LANG_STOPWORDS["en"]
    sw_hits = F.size(F.filter(toks, lambda x: x.isin(sw)))
    mean_tok = F.when(n_toks > 0, F.round(alnum / n_toks, 6)).otherwise(F.lit(0.0))
    alnum_ratio = F.when(n_chars > 0, F.round(alnum / n_chars, 6)).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_toks > 0, F.round(sw_hits / n_toks, 6)).otherwise(F.lit(0.0))
    # the SHARED gate expression (also drives prepare_corpus's one-pass
    # audit) — it gates on the UNROUNDED ratio; a second inline copy here
    # could silently desynchronize the two
    is_q = quality_flag_expr(text_col)
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_toks.cast("long").alias("n_tokens"),
        mean_tok.alias("mean_token_len"),
        alnum_ratio.alias("alnum_ratio"),
        sw_ratio.alias("stopword_ratio"),
        is_q.alias("is_quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, pred_lang, hits)`` — stopword-hit argmax heuristic with
    deterministic alphabetical tie-break (shared with pred_lang_expr)."""
    exprs = _lang_hit_exprs(text_col)
    with_hits = docs.select(
        "doc_id", *[exprs[lang].alias(f"hits_{lang}") for lang in _LANGS]
    )
    pred, best = _argmax_pred({lang: F.col(f"hits_{lang}") for lang in _LANGS})
    return with_hits.select(
        "doc_id", pred.alias("pred_lang"), best.cast("long").alias("hits")
    )


def winnowing_fingerprint(
    docs: DataFrame, k: int = 3, window: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprint: ``(doc_id, fingerprint string)``.

    k-shingle rolling hashes grouped into fixed windows of ``window``
    consecutive shingles; the min hash of each window is selected; the
    fingerprint is the sorted distinct selection, emitted as a
    comma-joined string (hashable by the driver canonicalizer, which
    cannot sort array columns). Deterministic via md5.
    """
    toks = tokenize_expr(text_col)
    sh = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    sh = F.when(F.size(toks) >= k, sh).otherwise(F.array().cast("array<string>"))
    pos = docs.select("doc_id", F.posexplode(sh).alias("pos", "shingle"))
    h = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
    win = (F.col("pos") / window).cast("int")
    mins = (
        pos.select("doc_id", win.alias("w"), h.alias("h"))
        .groupBy("doc_id", "w")
        .agg(F.min("h").alias("mh"))
    )
    return mins.groupBy("doc_id").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_set("mh")), lambda x: x.cast("string")
            ),
        ).alias("fingerprint")
    )


def _gopher_exprs(text_col: str) -> dict:
    """The Gopher measures as raw (unrounded) Column expressions —
    shared by :func:`gopher_quality` and :func:`gopher_flag_expr` so the
    reported features and the gate can never diverge."""
    t = F.col(text_col)
    words = F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z가-힣]")))
    hash_chars = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ellipses = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    lines = F.filter(F.split(t, "\n"), lambda x: F.length(x) > 0)
    n_lines = F.size(lines)
    dlines = F.array_distinct(lines)
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    dline_chars = F.aggregate(
        dlines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    nw = n_words.cast("double")
    return {
        "n_words": n_words,
        "mean_wl": F.when(n_words > 0, word_chars / nw).otherwise(F.lit(0.0)),
        "frac_alpha": F.when(n_words > 0, alpha_words / nw).otherwise(F.lit(0.0)),
        "sym": F.when(n_words > 0, (hash_chars + ellipses) / nw).otherwise(
            F.lit(0.0)
        ),
        "dlf": F.when(
            n_lines > 0, (n_lines - F.size(dlines)) / n_lines.cast("double")
        ).otherwise(F.lit(0.0)),
        "dlcf": F.when(
            line_chars > 0,
            (line_chars - dline_chars) / line_chars.cast("double"),
        ).otherwise(F.lit(0.0)),
    }


def gopher_flag_expr(text_col: str = "text"):
    """The combined Gopher pass gate as ONE Column expression (codegen,
    no join) — composable into the one-pass prepare_corpus audit."""
    e = _gopher_exprs(text_col)
    return (
        (e["n_words"] >= 50) & (e["n_words"] <= 100_000)
        & (e["mean_wl"] >= 3.0) & (e["mean_wl"] <= 10.0)
        & (e["frac_alpha"] >= 0.8)
        & (e["sym"] <= 0.1)
        & (e["dlf"] <= 0.3)
        & (e["dlcf"] <= 0.2)
    )


def gopher_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document-quality signals (Rae et al. 2021 §A1.1 —
    the standard web-corpus repetition/format filters), per doc:

    ``(doc_id, n_words, mean_word_len, frac_alpha_words, symbol_ratio,
    dup_line_frac, dup_line_char_frac, passes)``

    * words = non-empty whitespace splits; mean length over them
    * frac_alpha_words = words containing at least one letter
    * symbol_ratio = ('#' chars + '...' occurrences) / words
    * dup_line_frac / dup_line_char_frac = repeated non-empty lines as a
      fraction of line count / of line characters (first occurrence is
      not "duplicate"; array_distinct keeps firsts on both engines)
    * passes = the Gopher gates: 50<=words<=100k, 3<=mean<=10,
      alpha>=0.8, symbol<=0.1, dup lines<=0.3, dup chars<=0.2

    Pure Catalyst (split/filter/aggregate/array_distinct — codegen, no
    shuffle, no Python); the DuckDB twin mirrors every expression.
    """
    e = _gopher_exprs(text_col)
    return docs.select(
        "doc_id",
        e["n_words"].cast("long").alias("n_words"),
        F.round(e["mean_wl"], 4).alias("mean_word_len"),
        F.round(e["frac_alpha"], 4).alias("frac_alpha_words"),
        F.round(e["sym"], 4).alias("symbol_ratio"),
        F.round(e["dlf"], 4).alias("dup_line_frac"),
        F.round(e["dlcf"], 4).alias("dup_line_char_frac"),
        gopher_flag_expr(text_col).alias("passes"),
    )


def top_ngram_char_frac(docs: DataFrame, n: int = 2, text_col: str = "text") -> DataFrame:
    """Gopher's within-doc repetition metric: the fraction of a doc's
    token characters covered by occurrences of its most frequent token
    n-gram — ``(doc_id, top_ngram, n_occurrences, char_frac)``.

    ``char_frac = occurrences x token-chars(gram) / total token chars``
    (separators excluded on both factors). Tie-break: highest count,
    then lexicographically smallest gram — deterministic on both
    engines. One shuffle (the per-(doc, gram) count; the per-doc argmax
    is a window over it). Docs with fewer than n tokens surface with
    empty gram / zeros via the left join.
    """
    from pyspark.sql import Window

    toks = tokenize_expr(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    grams = F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    base = docs.select(
        "doc_id", tok_chars.alias("tok_chars"), F.explode(grams).alias("gram")
    )
    counts = base.groupBy("doc_id", "tok_chars", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("gram"))
    top = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    gram_chars = F.length(F.col("gram")) - (n - 1)  # minus separators
    frac = F.when(
        F.col("tok_chars") > 0,
        F.col("cnt") * gram_chars / F.col("tok_chars").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        docs.select("doc_id")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("gram", F.lit("")).alias("top_ngram"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("n_occurrences"),
            F.round(F.coalesce(frac, F.lit(0.0)), 4).alias("char_frac"),
        )
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-relative unigram log-probability per doc — the model-free
    stand-in for the CCNet/KenLM quality filter:
    ``(doc_id, n_tokens, avg_logprob)`` with
    ``avg_logprob = Σ_t tf_doc(t)·ln(ctf(t)/T) / n_tokens`` under the
    corpus MLE (ctf = corpus term count, T = total tokens). Documents
    of common language score high; gibberish and rare-token spam score
    low. Zero-token docs surface with avg 0.0.

    Scale shape: one (doc, term) tf shuffle, a vocabulary-sized term
    total (broadcast back), and a scalar token total — no all-pairs, no
    driver state. Deterministic to 4 dp (integer counts → exact ratio
    args; sum-order noise is ~1e-14, absorbed by the rounding, same
    contract as the BM25 oracle)."""
    toks = docs.select(
        "doc_id", F.explode(tokenize_expr(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    totals = tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    grand = totals.agg(F.sum("ctf").alias("t_total"))
    contrib = (
        tf.join(F.broadcast(totals), "term")
        .crossJoin(F.broadcast(grand))
        .select(
            "doc_id",
            "tf",
            (F.col("tf") * F.log(F.col("ctf") / F.col("t_total"))).alias("c"),
        )
    )
    per = contrib.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"), F.sum("c").alias("s")
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(
                F.coalesce(F.col("s") / F.col("n_tokens"), F.lit(0.0)), 4
            ).alias("avg_logprob"),
        )
    )


#: PII patterns — verified to extract IDENTICALLY under Java regex
#: (Spark) and RE2 (DuckDB); keep them in this dialect-neutral subset
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d{2,3}[- ]\d{3,4}[- ]\d{4}",
}
#: redaction order matters: emails/IPs contain digit runs a phone
#: pattern could partially match, so they are replaced first
_PII_ORDER = ("email", "ip", "phone")


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII counts (the C4/CCNet/Dolma-style scrub stage):
    ``(doc_id, n_emails, n_ips, n_phones, has_pii)`` — pure codegen
    regexp_extract_all, no shuffle."""
    counts = {
        k: F.size(F.regexp_extract_all(F.col(text_col), F.lit(p), F.lit(0)))
        for k, p in PII_PATTERNS.items()
    }
    return docs.select(
        "doc_id",
        counts["email"].cast("long").alias("n_emails"),
        counts["ip"].cast("long").alias("n_ips"),
        counts["phone"].cast("long").alias("n_phones"),
        ((counts["email"] + counts["ip"] + counts["phone"]) > 0).alias("has_pii"),
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, text)`` with every PII match replaced by its
    ``<TYPE>`` placeholder, email→ip→phone order (emails/IPs would
    otherwise partially match the phone digit runs)."""
    t = F.col(text_col)
    for k in _PII_ORDER:
        t = F.regexp_replace(t, PII_PATTERNS[k], f"<{k.upper()}>")
    return docs.select("doc_id", t.alias("text"))


# --- SQL twins --------------------------------------------------------------

_TOKS = "regexp_extract_all(lower(text), '[a-z0-9가-힣]+')"


def sql_token_counts(table: str = "documents") -> str:
    return f"""
SELECT doc_id, len({_TOKS}) AS n_tokens,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_ws_tokens
FROM {table}
"""


def sql_quality_scores(table: str = "documents") -> str:
    sw = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return f"""
WITH base AS (
  SELECT doc_id, length(text) AS n_chars, {_TOKS} AS toks,
         length(regexp_replace(text, '[^a-zA-Z0-9가-힣]', '', 'g')) AS alnum
  FROM {table}
)
SELECT doc_id, n_chars, len(toks) AS n_tokens,
  CASE WHEN len(toks) > 0 THEN round(alnum / len(toks), 6) ELSE 0.0 END AS mean_token_len,
  CASE WHEN n_chars > 0 THEN round(alnum / n_chars, 6) ELSE 0.0 END AS alnum_ratio,
  CASE WHEN len(toks) > 0
       THEN round(len(list_filter(toks, t -> list_contains([{sw}], t))) / len(toks), 6)
       ELSE 0.0 END AS stopword_ratio,
  (n_chars >= 10 AND (CASE WHEN n_chars > 0 THEN alnum / n_chars ELSE 0 END) > 0.5
   AND len(toks) >= 3) AS is_quality
FROM base
"""


def sql_lang_id(table: str = "documents") -> str:
    hit_exprs = ", ".join(
        "len(list_filter(toks, t -> list_contains(["
        + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        + f"], t))) AS hits_{lang}"
        for lang in _LANGS
    )
    best = "greatest(" + ", ".join(f"hits_{l}" for l in _LANGS) + ")"
    case = "CASE " + " ".join(
        f"WHEN hits_{l} = {best} THEN '{l}'" for l in _LANGS
    ) + " END"
    return f"""
WITH h AS (SELECT doc_id, {hit_exprs}
           FROM (SELECT doc_id, {_TOKS} AS toks FROM {table}))
SELECT doc_id, {case} AS pred_lang, {best} AS hits FROM h
"""


def sql_gopher_quality(table: str = "documents") -> str:
    """DuckDB twin of :func:`gopher_quality` — identical expressions,
    list_* in place of the Catalyst array functions."""
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), w -> length(w) > 0) AS words,
         list_filter(string_split(text, chr(10)), x -> length(x) > 0) AS lines,
         length(text) - length(replace(text, '#', '')) AS hash_chars,
         (length(text) - length(replace(text, '...', ''))) / 3 AS ellipses
  FROM {table}
), agg AS (
  SELECT doc_id, len(words) AS n_words,
         CAST(coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS DOUBLE) AS word_chars,
         len(list_filter(words, w -> regexp_matches(w, '[A-Za-z가-힣]'))) AS alpha_words,
         hash_chars, ellipses,
         len(lines) AS n_lines,
         len(list_distinct(lines)) AS n_dlines,
         CAST(coalesce(list_sum(list_transform(lines, x -> length(x))), 0) AS DOUBLE) AS line_chars,
         CAST(coalesce(list_sum(list_transform(list_distinct(lines), x -> length(x))), 0) AS DOUBLE) AS dline_chars
  FROM base
), m AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words > 0 THEN word_chars / n_words ELSE 0.0 END AS mean_wl,
         CASE WHEN n_words > 0 THEN CAST(alpha_words AS DOUBLE) / n_words ELSE 0.0 END AS frac_alpha,
         CASE WHEN n_words > 0 THEN (hash_chars + ellipses) / n_words ELSE 0.0 END AS sym,
         CASE WHEN n_lines > 0 THEN CAST(n_lines - n_dlines AS DOUBLE) / n_lines ELSE 0.0 END AS dlf,
         CASE WHEN line_chars > 0 THEN (line_chars - dline_chars) / line_chars ELSE 0.0 END AS dlcf
  FROM agg
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       round(mean_wl, 4) AS mean_word_len,
       round(frac_alpha, 4) AS frac_alpha_words,
       round(sym, 4) AS symbol_ratio,
       round(dlf, 4) AS dup_line_frac,
       round(dlcf, 4) AS dup_line_char_frac,
       (n_words >= 50 AND n_words <= 100000
        AND mean_wl >= 3.0 AND mean_wl <= 10.0
        AND frac_alpha >= 0.8 AND sym <= 0.1
        AND dlf <= 0.3 AND dlcf <= 0.2) AS passes
FROM m
"""


def sql_unigram_logprob(table: str = "documents") -> str:
    """DuckDB twin of :func:`unigram_logprob`."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM {table}
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
totals AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM tf GROUP BY 1),
grand AS (SELECT CAST(sum(ctf) AS BIGINT) AS t_total FROM totals),
per AS (
  SELECT tf.doc_id, sum(tf.tf) AS n_tokens,
         sum(tf.tf * ln(CAST(totals.ctf AS DOUBLE) / grand.t_total)) AS s
  FROM tf JOIN totals USING (term) CROSS JOIN grand
  GROUP BY tf.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
       round(coalesce(per.s / per.n_tokens, 0.0), 4) AS avg_logprob
FROM {table} d LEFT JOIN per ON d.doc_id = per.doc_id
"""


def sql_pii_stats(table: str = "documents") -> str:
    """DuckDB twin of :func:`pii_stats`."""
    c = {
        k: f"len(regexp_extract_all(text, '{p}'))"
        for k, p in PII_PATTERNS.items()
    }
    return f"""
SELECT doc_id,
       CAST({c['email']} AS BIGINT) AS n_emails,
       CAST({c['ip']} AS BIGINT) AS n_ips,
       CAST({c['phone']} AS BIGINT) AS n_phones,
       ({c['email']} + {c['ip']} + {c['phone']}) > 0 AS has_pii
FROM {table}
"""


def sql_redact_pii(table: str = "documents") -> str:
    """DuckDB twin of :func:`redact_pii` (same replacement order)."""
    t = "text"
    for k in _PII_ORDER:
        t = f"regexp_replace({t}, '{PII_PATTERNS[k]}', '<{k.upper()}>', 'g')"
    return f"SELECT doc_id, {t} AS text FROM {table}"


def sql_top_ngram_char_frac(table: str = "documents", n: int = 2) -> str:
    """DuckDB twin of :func:`top_ngram_char_frac`."""
    return f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS toks FROM {table}
), grams AS (
  SELECT doc_id,
         coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS tok_chars,
         array_to_string(toks[i : i + {n - 1}], ' ') AS gram
  FROM base, LATERAL unnest(range(1, greatest(len(toks) - {n - 1}, 0) + 1)) t(i)
), counts AS (
  SELECT doc_id, tok_chars, gram, count(*) AS cnt
  FROM grams GROUP BY doc_id, tok_chars, gram
), top AS (
  SELECT doc_id, tok_chars, gram, cnt,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
  FROM counts
)
SELECT d.doc_id,
       coalesce(t.gram, '') AS top_ngram,
       CAST(coalesce(t.cnt, 0) AS BIGINT) AS n_occurrences,
       round(coalesce(
         t.cnt * (length(t.gram) - {n - 1}) / CAST(t.tok_chars AS DOUBLE),
         0.0), 4) AS char_frac
FROM {table} d LEFT JOIN (SELECT * FROM top WHERE rn = 1) t ON d.doc_id = t.doc_id
"""


def sql_winnowing_fingerprint(table: str = "documents", k: int = 3, window: int = 4) -> str:
    return f"""
WITH sh AS (
  SELECT doc_id, i - 1 AS pos,
         CAST(('0x' || substr(md5(array_to_string(toks[i : i + {k - 1}], ' ')), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, {_TOKS} AS toks FROM {table}),
       LATERAL unnest(range(1, greatest(len(toks) - {k - 1}, 0) + 1)) AS t(i)
),
mins AS (SELECT doc_id, pos // {window} AS w, min(h) AS mh FROM sh GROUP BY 1, 2)
SELECT doc_id, array_to_string(list_sort(list(DISTINCT mh)), ',') AS fingerprint
FROM mins GROUP BY doc_id
"""
