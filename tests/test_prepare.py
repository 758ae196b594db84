"""Corpus-preparation pipeline composition."""

from sifter_mrc_search_engine_spark.plans.prepare import prepare_corpus


def test_prepare_corpus_stages(spark):
    rows = [
        (0, "the good long document with many proper words inside"),
        (1, "the good long document with many proper words inside"),  # exact dup
        (2, "short"),  # fails quality (length < 10)
        (3, "!!!! ???? ....::::;;;; @@@@ #### $$$$ %%%% ^^^^"),  # alnum ratio
        (4, "another quality document of the corpus with the words"),
        (5, "the good long document with many proper words inside extra"),  # near-dup of 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    clean, audit = prepare_corpus(docs, near_dup=True)
    a = audit.collect()[0]
    assert a["input"] == 6
    assert a["after_quality"] == 4  # 2 and 3 dropped
    assert a["after_exact_dedup"] == 3  # 1 dropped (dup of 0)
    kept = sorted(r["doc_id"] for r in clean.collect())
    assert 0 in kept and 4 in kept
    assert 1 not in kept and 2 not in kept and 3 not in kept
    # near-dup: 5 shares most 3-shingles with 0 -> LSH should pair them
    assert a["after_near_dedup"] <= a["after_exact_dedup"]


def test_prepare_with_html_and_lang(spark):
    rows = [
        (0, b"<p>the quick document of the day with words</p>"),
        (1, b"<div>der hund und die katze sind nicht da ein tag</div>"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, html binary")
    clean, audit = prepare_corpus(docs, html_col="html", lang="en")
    kept = [r["doc_id"] for r in clean.collect()]
    assert kept == [0]
    texts = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert texts[0] == "the quick document of the day with words"


def test_prepare_single_input_scan(spark, tmp_path):
    """The audit aggregates flag columns in ONE pass: its plan contains
    exactly one scan of the input (the r1 version re-scanned per stage
    counter — a ~5x input multiplier at corpus scale)."""
    p = str(tmp_path / "docs")
    rows = [(i, f"the document number {i} of the corpus with a few words") for i in range(20)]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
    docs = spark.read.parquet(p)
    clean, audit = prepare_corpus(docs, lang="en")
    plan = audit._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1, plan
    a = audit.collect()[0]
    assert a["input"] == 20 and a["after_exact_dedup"] == 20
    # clean output is itself a single-scan plan
    cplan = clean._jdf.queryExecution().optimizedPlan().toString()
    assert cplan.count("Relation") == 1, cplan


def test_prepare_optional_stages(spark):
    """gopher/redact/bench stages compose into the pipeline: redaction
    rewrites PII before fingerprinting, the Gopher gate tightens the
    one-pass quality flag, and benchmark decontamination drops the
    contaminated doc with its own audit column."""
    from sifter_mrc_search_engine_spark.plans.prepare import prepare_corpus

    bench = spark.createDataFrame(
        [(100, "the forbidden benchmark answer string held out for eval")],
        "doc_id long, text string",
    )
    prose = (
        "plain useful prose with enough distinct words to clear every "
        "gopher gate comfortably and then some more filler words here "
        "continuing onward with additional sensible content so the "
        "fifty word minimum is satisfied by this single document body "
        "text which keeps going a little longer for safety margin okay "
        "plus several extra trailing words to stay safely past fifty"
    )
    docs = spark.createDataFrame(
        [
            (1, prose),
            (2, prose + " email me at a.b@c-d.org thanks"),
            (3, "contains the forbidden benchmark answer string held out for eval " + prose),
            (4, "short spammy #### ... thing"),
        ],
        "doc_id long, text string",
    )
    clean, audit = prepare_corpus(
        docs, gopher=True, redact=True, bench=bench, decontaminate_k=8
    )
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert kept == {1, 2}  # 3 decontaminated, 4 fails gopher
    a = audit.collect()[0].asDict()
    assert a["input"] == 4
    assert a["after_gopher"] == 3  # doc 4 fails the gopher gates
    assert a["after_exact_dedup"] == 3
    assert a["after_decontamination"] == 2
    # redaction happened BEFORE output: doc 2 ships placeholders
    t2 = clean.filter("doc_id = 2").first()["text"]
    assert "<EMAIL>" in t2 and "@" not in t2


def test_near_dup_transitive_vs_pairwise(spark):
    """Docs linked only THROUGH a middleman: pairwise drop (doc_b of each
    pair) keeps both endpoints of an indirect link; the transitive mode
    keeps exactly the component minimum."""
    from pyspark.sql import functions as F

    from sifter_mrc_search_engine_spark.operators.dedup import lsh_candidate_pairs
    from sifter_mrc_search_engine_spark.plans.prepare import prepare_corpus

    base = "tokens alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base + " lamb"), (2, base + " mu"), (3, base),
         (9, "completely different content with nothing shared at all here")],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs).collect()}
    assert pairs, "fixture must produce near-dup pairs"

    pw, _ = prepare_corpus(docs, near_dup=True)
    tr, _ = prepare_corpus(docs, near_dup=True, near_dup_transitive=True)
    kept_tr = sorted(r["doc_id"] for r in tr.select("doc_id").collect())
    # transitive: exactly one survivor (the min id) per component + doc 9
    assert kept_tr == [1, 9]
    kept_pw = sorted(r["doc_id"] for r in pw.select("doc_id").collect())
    assert set(kept_tr) <= set(kept_pw)  # transitive is at least as strict


def test_prepare_and_index_resume_fingerprint(spark, tmp_path):
    """A resumed submit with DIFFERENT --input or stage flags must
    rebuild clean_corpus instead of silently indexing the stale cached
    one (the build's own input_fingerprint can't catch this — it
    fingerprints the cached parquet, not what produced it)."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jobs.prepare_and_index import main as job_main

    in_a = str(tmp_path / "in_a")
    in_b = str(tmp_path / "in_b")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(i, f"alpha corpus document number {i} with plenty of words") for i in range(8)],
        "doc_id long, text string",
    ).write.parquet(in_a)
    spark.createDataFrame(
        [(i, f"beta corpus document number {i} with plenty of words") for i in range(5)],
        "doc_id long, text string",
    ).write.parquet(in_b)

    job_main(["--input", in_a, "--output", out])
    audit1 = json.loads(Path(out, "prepare_audit.json").read_text())
    assert audit1["input"] == 8
    assert audit1["_prepare_opts"]["input"] == in_a

    # same input + flags -> the cached corpus IS reused (audit untouched)
    mtime = Path(out, "clean_corpus", "_SUCCESS").stat().st_mtime_ns
    job_main(["--input", in_a, "--output", out])
    assert Path(out, "clean_corpus", "_SUCCESS").stat().st_mtime_ns == mtime

    # changed input -> fingerprint mismatch -> corpus + audit rebuilt
    job_main(["--input", in_b, "--output", out])
    audit2 = json.loads(Path(out, "prepare_audit.json").read_text())
    assert audit2["input"] == 5
    assert audit2["_prepare_opts"]["input"] == in_b
    texts = {r["text"] for r in spark.read.parquet(f"{out}/clean_corpus").collect()}
    assert all("beta" in t for t in texts)


def test_prepare_and_index_resume_bucket_change_rebuilds(spark, tmp_path):
    """--buckets shapes the index partition hashing: a resumed submit
    with a different count must rebuild, not silently serve an index
    whose hash(term) %% buckets disagrees with the searcher's."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jobs.prepare_and_index import main as job_main

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(i, f"gamma corpus document number {i} with plenty of words") for i in range(6)],
        "doc_id long, text string",
    ).write.parquet(inp)
    job_main(["--input", inp, "--output", out, "--buckets", "8"])
    assert json.loads(Path(out, "index_opts.json").read_text())["buckets"] == 8
    corpus_mt = Path(out, "clean_corpus", "_SUCCESS").stat().st_mtime_ns
    job_main(["--input", inp, "--output", out, "--buckets", "4"])
    assert json.loads(Path(out, "index_opts.json").read_text())["buckets"] == 4
    # buckets is an INDEX knob: the corpus must be reused, not re-prepared
    assert Path(out, "clean_corpus", "_SUCCESS").stat().st_mtime_ns == corpus_mt
    # the rebuilt index really has the new bucket count end to end
    import pyspark.sql.functions as F

    p = spark.read.parquet(f"{out}/postings")
    assert p.select(F.max("bucket")).first()[0] < 4


def test_make_training_data_job(spark, tmp_path, capsys):
    """One submit: gated corpus -> packed chunks (+ NSP pairs + MLM
    masks), resumable per export, fingerprint-guarded like
    prepare_and_index."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jobs.make_training_data import main as job_main

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [
            (i, "the corpus sentence number one has words. "
                f"and sentence two follows it with more words {i}.")
            for i in range(12)
        ],
        "doc_id long, text string",
    ).write.parquet(inp)

    job_main(["--input", inp, "--output", out, "--budget", "32",
              "--nsp", "--mlm"])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["audit"]["input"] == 12
    assert summary["exports"]["chunks"] > 1      # cross-doc packing happened
    assert summary["exports"]["nsp_pairs"] >= 12  # one pair per lead sentence
    assert summary["exports"]["mlm"] == 12

    chunks = spark.read.parquet(f"{out}/chunks")
    assert set(chunks.columns) == {"chunk_id", "n_tokens", "chunk_text"}
    sizes = [r["n_tokens"] for r in chunks.orderBy("chunk_id").collect()]
    assert all(s == 32 for s in sizes[:-1]) and 0 < sizes[-1] <= 32
    pairs = spark.read.parquet(f"{out}/nsp_pairs")
    assert set(pairs.columns) >= {"first", "second", "label"}
    assert {r["label"] for r in pairs.collect()} <= {0, 1}

    # re-run with the same flags: every export reused (markers present)
    mt = Path(out, "chunks", "_SUCCESS").stat().st_mtime_ns
    job_main(["--input", inp, "--output", out, "--budget", "32",
              "--nsp", "--mlm"])
    assert Path(out, "chunks", "_SUCCESS").stat().st_mtime_ns == mt

    # changed budget -> the CHUNKS export rebuilds (its own opts guard)
    # but the expensive prepare pipeline does NOT re-run: budget is an
    # export knob, not a corpus-affecting flag
    corpus_mt = Path(out, "clean_corpus", "_SUCCESS").stat().st_mtime_ns
    nsp_mt = Path(out, "nsp_pairs", "_SUCCESS").stat().st_mtime_ns
    job_main(["--input", inp, "--output", out, "--budget", "16",
              "--nsp", "--mlm"])
    sizes16 = [
        r["n_tokens"]
        for r in spark.read.parquet(f"{out}/chunks").orderBy("chunk_id").collect()
    ]
    assert all(s == 16 for s in sizes16[:-1])
    assert Path(out, "clean_corpus", "_SUCCESS").stat().st_mtime_ns == corpus_mt
    assert Path(out, "nsp_pairs", "_SUCCESS").stat().st_mtime_ns == nsp_mt


def test_hint_shaped_input_end_to_end(spark, tmp_path, capsys):
    """The north-rule input shape — a URL-keyed pages table with
    (url, warc_ts, html binary, text, lang) and NO numeric id — runs
    through the full job via --id-from url --html: ids assigned by
    audited xxhash64, text extracted from the html bytes, index built."""
    import datetime
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jobs.prepare_and_index import main as job_main

    rows = [
        (
            f"https://example.org/site/{i}",
            datetime.datetime(2024, 1, 1, 0, 0, i),
            f"<html><body><p>the crawled page number {i} has plenty of words"
            f"</p></body></html>".encode(),
            "",  # raw text column unused when --html extracts
            "en",
        )
        for i in range(9)
    ]
    inp = str(tmp_path / "pages")
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).write.parquet(inp)
    out = str(tmp_path / "idx")
    job_main([
        "--input", inp, "--output", out, "--buckets", "4",
        "--html", "--id-from", "url",
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["audit"]["input"] == 9
    assert summary["build"]["n_docs"] == 9
    clean = spark.read.parquet(f"{out}/clean_corpus")
    texts = {r["text"] for r in clean.collect()}
    assert all(t.startswith("the crawled page number") for t in texts)


def test_assign_doc_ids_deterministic_and_audited(spark):
    """id assignment is a pure function of the key (stable across
    re-reads/incremental loads) and the audit passes on distinct keys;
    a true 64-bit collision is impractical to synthesize, so the raise
    path is covered by the audit arithmetic itself (distinct keys vs
    distinct ids)."""
    from sifter_mrc_search_engine_spark.plans.prepare import assign_doc_ids

    ok = spark.createDataFrame(
        [(f"u{i}",) for i in range(50)], "url string"
    )
    ids = assign_doc_ids(ok, from_col="url")
    assert ids.select("doc_id").distinct().count() == 50
    # true hash collisions are impractical to synthesize; disable the
    # check and verify determinism instead (same key -> same id)
    again = assign_doc_ids(ok, from_col="url", check=False)
    a = {r["url"]: r["doc_id"] for r in ids.collect()}
    b = {r["url"]: r["doc_id"] for r in again.collect()}
    assert a == b


def test_assign_doc_ids_duplicate_keys_and_keep_latest(spark):
    """Recrawled URLs (same key, several warc_ts rows) must not slip two
    rows onto one doc_id: duplicates are a hard error, and
    keep_latest_by keeps exactly the newest row per key."""
    import datetime

    import pytest as _pytest

    from sifter_mrc_search_engine_spark.plans.prepare import assign_doc_ids

    ts = datetime.datetime
    rows = [
        ("https://a.example/1", ts(2024, 1, 1), "old content of page one"),
        ("https://a.example/1", ts(2024, 2, 1), "new content of page one"),
        ("https://a.example/2", ts(2024, 1, 5), "only crawl of page two"),
    ]
    docs = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    with _pytest.raises(ValueError, match="duplicate"):
        assign_doc_ids(docs, from_col="url")
    kept = assign_doc_ids(docs, from_col="url", keep_latest_by="warc_ts")
    out = {r["url"]: r["text"] for r in kept.collect()}
    assert out == {
        "https://a.example/1": "new content of page one",
        "https://a.example/2": "only crawl of page two",
    }
    assert kept.select("doc_id").distinct().count() == 2


def test_rebuild_clears_stale_exports_without_detected_mismatch(spark, tmp_path, capsys):
    """Any corpus rebuild clears derived exports — even when no opts
    MISMATCH is detectable (crash between the audit unlink and the
    clear, a hand-deleted audit, an old-format audit file). Exports'
    own ``_EXPORT_OPTS`` record only export knobs, so without the
    unconditional clear they would pass their check against a corpus
    rebuilt under different prepare flags (ADVICE r4)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jobs.make_training_data import main as job_main

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(i, "the corpus sentence number one has words. "
             f"and sentence two follows it {i}.") for i in range(6)],
        "doc_id long, text string",
    ).write.parquet(inp)
    job_main(["--input", inp, "--output", out, "--budget", "32"])
    capsys.readouterr()

    # simulate the crash window: the audit is gone but exports remain
    Path(out, "prepare_audit.json").unlink()
    sentinel = Path(out, "chunks", "stale_part_from_old_corpus.parquet")
    sentinel.write_text("stale")

    job_main(["--input", inp, "--output", out, "--budget", "32"])
    capsys.readouterr()
    assert not sentinel.exists(), "stale export survived a corpus rebuild"
    assert Path(out, "chunks", "_SUCCESS").exists()  # rebuilt, not just wiped


def test_input_content_mutation_invalidates_corpus(spark, tmp_path, capsys):
    """Data mutated IN PLACE at the same --input path (a re-crawl that
    overwrites the parquet dir) must rebuild the corpus: prepare_opts
    record a content fingerprint (sizes+mtimes), not just the path
    string (ADVICE r4)."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jobs.prepare_and_index import main as job_main

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(i, f"alpha corpus document number {i} with plenty of words")
         for i in range(8)],
        "doc_id long, text string",
    ).write.parquet(inp)
    job_main(["--input", inp, "--output", out])
    capsys.readouterr()

    # overwrite the SAME path with different data
    spark.createDataFrame(
        [(i, f"mutated corpus document number {i} with plenty of words")
         for i in range(5)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(inp)
    job_main(["--input", inp, "--output", out])
    capsys.readouterr()
    audit = json.loads(Path(out, "prepare_audit.json").read_text())
    assert audit["input"] == 5
    texts = {r["text"] for r in spark.read.parquet(f"{out}/clean_corpus").collect()}
    assert all("mutated" in t for t in texts)


def test_lang_change_invalidates_exports(spark, tmp_path, capsys):
    """A changed corpus-affecting flag (--lang) on make_training_data
    must invalidate the EXPORTS too, not just the corpus: exports'
    _EXPORT_OPTS only record export knobs, so the prepare-opts guard is
    what protects them (VERDICT r4 item 9)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jobs.make_training_data import main as job_main

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(i, "the corpus sentence number one has many common english "
             f"words in it. and the second sentence follows it {i}.")
         for i in range(6)],
        "doc_id long, text string",
    ).write.parquet(inp)

    job_main(["--input", inp, "--output", out, "--budget", "32"])
    capsys.readouterr()
    mt = Path(out, "chunks", "_SUCCESS").stat().st_mtime_ns

    job_main(["--input", inp, "--output", out, "--budget", "32",
              "--lang", "en"])
    capsys.readouterr()
    assert Path(out, "chunks", "_SUCCESS").stat().st_mtime_ns != mt, (
        "chunks export served stale after a corpus-affecting flag change"
    )


def test_raw_input_fingerprint_classification(tmp_path):
    """Shape-based classification (r5 review): catalog refs never touch
    the JVM; local mutation changes the hash; a JVM-less session (Spark
    Connect) degrades to the path record; a LISTING failure for a real
    filesystem ref RAISES instead of silently recording the constant
    (which would force a spurious full rebuild on the next healthy
    run)."""
    from types import SimpleNamespace

    import pytest

    from sifter_mrc_search_engine_spark.plans.prepare import (
        raw_input_fingerprint,
    )

    class Untouchable:
        """A 'spark' that fails the test if anything is accessed."""

        def __getattr__(self, k):
            raise AssertionError(f"JVM touched for a catalog ref ({k})")

    # slash-free / table:-prefixed refs are catalog refs: constant
    # record, zero JVM traffic even with a session available
    assert raw_input_fingerprint("cat.db.pages", Untouchable()) == (
        "ref:cat.db.pages"
    )
    assert raw_input_fingerprint("table:pages", Untouchable()) == (
        "ref:table:pages"
    )

    # local content identity: same path, changed bytes -> changed hash
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "part-0.parquet").write_text("aaaa")
    h1 = raw_input_fingerprint(str(d))
    (d / "part-0.parquet").write_text("aaaabbbb")
    h2 = raw_input_fingerprint(str(d))
    assert h1 != h2 and "ref:" not in h1

    class NoJvm:
        """Spark Connect shape: no _jvm gateway at all."""

        @property
        def _jvm(self):
            raise AttributeError("no JVM in Spark Connect")

    missing = str(tmp_path / "definitely" / "missing")
    assert raw_input_fingerprint(missing, NoJvm()) == f"ref:{missing}"

    class Boom:
        """Every attribute access returns itself; any CALL explodes —
        the transient-listing-failure shape."""

        def __getattr__(self, k):
            return self

        def __call__(self, *a, **kw):
            raise RuntimeError("transient listing failure")

    fake = SimpleNamespace(_jvm=Boom(), _jsc=Boom())
    with pytest.raises(RuntimeError, match="transient"):
        raw_input_fingerprint(missing, fake)
