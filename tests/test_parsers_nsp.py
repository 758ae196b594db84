"""File-parser dispatch (S5-S11) + NSP/MLM randomized-op contracts.

The NSP/MLM assertions mirror the reference's own statistical tests
(tests/lm_post_training/preprocessor_test.py:71-158)."""

import numpy as np
import pytest

from sifter_mrc_search_engine_spark.operators.nsp import (
    MASK_TOKEN,
    mask_tokens,
    nsp_pairs,
)
from sifter_mrc_search_engine_spark.sources.parsers import (
    parse_files,
    parse_text_buffer,
    read_files,
)


def test_text_parser_semantics():
    # text_parser.py:5-14: split on \n\n\n, drop <= 10 chars
    buf = "first paragraph here\n\n\nshort\n\n\nsecond long paragraph".encode()
    assert parse_text_buffer(buf) == ["first paragraph here", "second long paragraph"]


def test_binary_source_and_dispatch(spark, tmp_path):
    (tmp_path / "a.txt").write_text("alpha paragraph one\n\n\nbeta paragraph two")
    (tmp_path / "b.txt").write_text("tiny\n\n\ngamma paragraph three")
    files = read_files(spark, str(tmp_path), "*.txt")
    rows = parse_files(files).collect()
    paras = sorted(r["paragraph"] for r in rows)
    assert paras == [
        "alpha paragraph one",
        "beta paragraph two",
        "gamma paragraph three",
    ]
    # paragraph ordering within a file is preserved
    a = sorted(
        [(r["paragraph_idx"], r["paragraph"]) for r in rows if r["path"].endswith("a.txt")]
    )
    assert a == [(0, "alpha paragraph one"), (1, "beta paragraph two")]


def test_unsupported_extension_raises(spark, tmp_path):
    (tmp_path / "x.xyz").write_text("data")
    files = read_files(spark, str(tmp_path), "*.xyz")
    with pytest.raises(Exception, match="unsupported file type"):
        parse_files(files).collect()


def test_malformed_pdf_raises_through_spark(spark, tmp_path):
    # PDF parses natively now (sources/pdf.py) — a malformed buffer
    # surfaces a PdfError from the executor, not a pdfminer import stub
    (tmp_path / "d.pdf").write_bytes(b"%PDF-fake")
    files = read_files(spark, str(tmp_path), "*.pdf")
    with pytest.raises(Exception, match="no indirect objects"):
        parse_files(files).collect()


@pytest.fixture(scope="module")
def articles(spark):
    rows = [
        (a, [f"art{a} sentence {i} content word" for i in range(6)])
        for a in range(30)
    ]
    return spark.createDataFrame(rows, "article_id long, sentences array<string>")


def test_nsp_contract(spark, articles):
    pairs = nsp_pairs(articles, prob=0.5, seed=42).collect()
    # 30 articles x 5 adjacent pairs, minus rare dropped collisions
    assert len(pairs) >= 30 * 5 - 5
    pos = [p for p in pairs if p["label"] == 1]
    neg = [p for p in pairs if p["label"] == 0]
    # label balance: each side > size/10 (preprocessor_test.py:113-122)
    assert len(pos) > len(pairs) // 10 and len(neg) > len(pairs) // 10
    # every positive is the true next sentence; every negative is foreign
    for p in pos:
        a, i = p["first"].split()[0], int(p["first"].split()[2])
        assert p["second"] == f"{a} sentence {i + 1} content word"
    for p in neg:
        assert p["first"].split()[0] != p["second"].split()[0]


def test_nsp_prob_one_all_positive(spark, articles):
    # prob=1 => all positive (preprocessor_test.py prob contract)
    pairs = nsp_pairs(articles, prob=1.0, seed=42).collect()
    assert pairs and all(p["label"] == 1 for p in pairs)


def test_nsp_deterministic_across_partitioning(spark, articles):
    a = sorted(map(tuple, nsp_pairs(articles, seed=7).collect()))
    b = sorted(map(tuple, nsp_pairs(articles.repartition(13), seed=7).collect()))
    assert a == b


def test_mlm_mask_ratio_contract(spark):
    # mean mask ratio in (0.08, 0.15) (preprocessor_test.py:71-80)
    rows = [(i, list(range(100, 200))) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, token_ids array<int>")
    out = mask_tokens(df).collect()
    ratios = []
    for r in out:
        orig = np.array(r["token_ids"])
        masked = np.array(r["masked_ids"])
        changed = (orig != masked).sum()
        n_masked_tok = (masked == MASK_TOKEN).sum()
        assert n_masked_tok <= 40
        ratios.append(n_masked_tok / orig.size)
    mean = float(np.mean(ratios))
    # 15% selected, 80% of those become MASK => ~0.12
    assert 0.08 < mean < 0.15, mean


def test_nsp_pool_not_broadcast(spark, articles):
    """The negative draw resolves via shuffled equi-joins on
    (bucket, rank): no broadcast HINT on the sentence pool (at corpus
    scale that would broadcast every sentence). AQE may still choose a
    broadcast for a tiny test pool — the contract is that the PLAN never
    demands one."""
    out = nsp_pairs(articles, prob=0.5, seed=42)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "strategy=broadcast" not in analyzed
