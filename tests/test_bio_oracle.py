"""Property test for the scan_text_bio DuckDB oracle: the SQL parse
(_BIO_ORACLE) must agree with an independent straight-line Python
reference on arbitrary corpora — tab-less lines, empty tags, leading/
trailing/repeated blank separators, multi-byte chars. The Spark side
is held to the same rows by check_harness; this pins the SQL half so
the cross-engine value-hash can't drift silently. No Spark session
needed (pure DuckDB), so it runs in milliseconds."""

import os

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from kgx.harness import _BIO_ORACLE

# line strategy: char + optional tab + tag, or sep (empty), or odd
# shapes (tab-first, tab-less multi-char)
_char = st.sampled_from(list("ab天宇. -"))
_tag = st.sampled_from(["O", "B-PER", "I-PER", "B-LOC", ""])
_line = st.one_of(
    st.just(""),  # sentence separator
    st.builds(lambda c, t: f"{c}\t{t}", _char, _tag),
    _char,  # no tab at all -> tag == ''
    st.builds(lambda t: f"\t{t}", _tag),  # empty char cell
)


def _reference(blob: str) -> set[tuple]:
    """Line-by-line reference mirroring the mapInPandas parse: file-
    local sent_id = number of blank lines seen so far; char = before
    first tab, tag = after it; per-sentence join in order."""
    out: dict[int, tuple[list, list]] = {}
    seps = 0
    for line in blob.split("\n"):
        if line == "":
            seps += 1
            continue
        ch, _, tag = line.partition("\t")
        out.setdefault(seps, ([], []))
        out[seps][0].append(ch)
        out[seps][1].append(tag)
    return {
        ("corpus.txt", sid, "".join(chs), " ".join(tags))
        for sid, (chs, tags) in out.items()
    }


@settings(max_examples=60, deadline=None)
@given(st.lists(_line, min_size=0, max_size=40))
def test_bio_sql_oracle_matches_reference(tmp_path_factory, lines):
    blob = "\n".join(lines)
    d = tmp_path_factory.mktemp("bio")
    p = os.path.join(d, "corpus.txt")
    with open(p, "w") as f:
        f.write(blob)
    sql = _BIO_ORACLE.format(path=p).replace(
        "'bio_eval.txt'", "'corpus.txt'")
    got = {tuple(r) for r in duckdb.sql(sql).fetchall()}
    assert got == _reference(blob)
