"""CFB container reader/writer + full HWP parse path (S9/T4/C14).

The reference walks HWP's OLE container with olefile
(modules/mrc_service/file_parser/hwp_parser.py:11-67); here a minimal
stdlib CFB implementation carries the same record semantics end to end.
"""

import zlib

import pytest

from sifter_mrc_search_engine_spark.sources.cfb import CfbReader, cfb_write
from sifter_mrc_search_engine_spark.sources.parsers import (
    hwp_record,
    parse_files,
    parse_hwp_buffer,
    read_files,
    synthesize_hwp,
)


def test_cfb_roundtrip_mini_and_regular_streams():
    streams = {
        ("FileHeader",): b"\x01" * 256,                      # mini (<4096)
        ("Big",): bytes(range(256)) * 40,                    # 10240 B: regular FAT
        ("Stor", "Child0"): b"hello cfb child stream",       # nested, mini
        ("Stor", "Child1"): b"z" * 5000,                     # nested, regular
    }
    buf = cfb_write(streams)
    r = CfbReader(buf)
    assert r.list_streams() == sorted(streams)
    for p, data in streams.items():
        assert r.read_stream(p) == data, p


def test_cfb_rejects_garbage():
    with pytest.raises(Exception, match="magic"):
        CfbReader(b"not a compound file at all" + b"\x00" * 600)


@pytest.mark.parametrize("compressed", [True, False])
def test_hwp_parse_sections_in_numeric_order(compressed):
    # sections written as 0,2,10 — numeric order must hold (hwp_parser.py:29-32,
    # lexicographic order would give Section10 before Section2)
    hwp = synthesize_hwp(
        [["alpha section zero"], ["charlie section two"], ["delta section ten"]],
        compressed=compressed,
    )
    # rename sections 1,2 -> 2,10 by rebuilding with explicit numbering
    from sifter_mrc_search_engine_spark.sources.cfb import CfbReader as R

    r = R(hwp)
    streams = {p: r.read_stream(p) for p in r.list_streams()}
    streams[("BodyText", "Section10")] = streams.pop(("BodyText", "Section2"))
    streams[("BodyText", "Section2")] = streams.pop(("BodyText", "Section1"))
    hwp2 = cfb_write(streams)
    out = parse_hwp_buffer(hwp2)
    assert out == ["alpha section zerocharlie section twodelta section ten"]


def test_hwp_validation_and_scrub():
    with pytest.raises(ValueError, match="Not Valid HWP"):
        parse_hwp_buffer(cfb_write({("SomethingElse",): b"x" * 64}))
    # control sequence + newlines scrubbed (hwp_parser.py:65)
    hwp = synthesize_hwp([["line one\nline two", "\x02捤獥\x00\x00\x00\x00\x02\x02汤捯\x00\x00\x00\x00\x02tail"]])
    assert parse_hwp_buffer(hwp) == ["line oneline twotail"]


def test_cfb_malformed_minifat_chain_raises_cfberror():
    """A garbage mini-FAT next-pointer must raise CfbError (like _chain),
    not IndexError or a silently truncated stream."""
    from sifter_mrc_search_engine_spark.sources.cfb import FREESECT, CfbError

    buf = cfb_write({("Mini",): b"m" * 300})  # <4096 -> mini stream
    r = CfbReader(buf)
    for bad in (FREESECT, len(r.minifat) + 7):
        r.minifat = list(r.minifat)
        r.minifat[0] = bad
        with pytest.raises(CfbError, match="mini FAT"):
            r._read_mini_chain(0, 300)


def test_hwp_short_content_is_not_length_gated():
    """Reference HwpParser.parse() returns [content] with NO length filter
    (hwp_parser.py:64-67) — a short HWP must answer, not vanish."""
    assert parse_hwp_buffer(synthesize_hwp([["ab"]])) == ["ab"]


def test_hwp_through_spark_dispatch(spark, tmp_path):
    """binaryFile scan -> extension dispatch -> HWP decode inside the
    pandas UDF -> exploded paragraphs (the reference's POST /inference/file
    lifecycle, server.py:140-152)."""
    (tmp_path / "doc.hwp").write_bytes(
        synthesize_hwp([["spark ingested hwp body text first"],
                        ["and the second section text"]])
    )
    files = read_files(spark, str(tmp_path), "*.hwp")
    rows = parse_files(files).collect()
    assert [r["paragraph"] for r in rows] == [
        "spark ingested hwp body text firstand the second section text"
    ]


def test_hwp_record_roundtrip_bitfields():
    rec = hwp_record(67, "텍스트".encode("utf-16-le"), level=3)
    hdr = int.from_bytes(rec[:4], "little")
    assert hdr & 0x3FF == 67
    assert (hdr >> 10) & 0x3FF == 3
    assert (hdr >> 20) & 0xFFF == len("텍스트".encode("utf-16-le"))


# --- property tests ----------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_name = st.text(
    alphabet=st.characters(min_codepoint=65, max_codepoint=122), min_size=1, max_size=12
)
_payload = st.binary(min_size=0, max_size=9000)  # straddles the 4096 mini cutoff


@settings(max_examples=25, deadline=None)
@given(
    st.dictionaries(
        st.one_of(
            _name.map(lambda n: (n,)),
            st.tuples(_name, _name),
        ),
        _payload,
        min_size=1,
        max_size=8,
    )
)
def test_cfb_roundtrip_property(streams):
    # a storage name must not collide with a stream name at top level
    tops_as_storage = {p[0] for p in streams if len(p) == 2}
    streams = {
        p: b for p, b in streams.items() if not (len(p) == 1 and p[0] in tops_as_storage)
    }
    if not streams:
        return
    buf = cfb_write(streams)
    r = CfbReader(buf)
    assert r.list_streams() == sorted(streams)
    for p, data in streams.items():
        assert r.read_stream(p) == data


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_characters=".!?…", blacklist_categories=("Cs", "Cc", "Zs")
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([". ", "! ", "? ", "… ", "?! "]),
)
def test_splitter_reassembles_property(bodies, term):
    """sentences joined with terminator+space split back to themselves."""
    from sifter_mrc_search_engine_spark.functions.sentences import split_sentences

    text = "".join(b + term for b in bodies)
    got = split_sentences(text)
    assert got == [b + term.strip() for b in bodies]
