"""Multimodal plumbing ops (SURVEY B.13): the decoders are honest
stubs (no PIL/ffmpeg in this container), so these tests pin the part
that IS real — schema, Arrow batching, per-frame explode shape, and
the deterministic relationship between payload bytes and stub output —
the exact seam a real decoder drops into."""

import hashlib

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_mm_decode_stub_matches_scalar_reference(spark):
    """Every (n_bytes, fake_width, fake_height) row must equal a
    driver-side recomputation from the document text — the same md5
    derivation the DuckDB oracle checks at sf0.01."""
    from kgx.harness import mm_decode_stub

    got = {r["doc_id"]: r for r in mm_decode_stub(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text").collect()
    assert len(got) == len(docs) > 0
    for d in docs:
        raw = d["text"].encode("utf-8")
        h = hashlib.md5(raw).digest()
        r = got[d["doc_id"]]
        assert r["n_bytes"] == len(raw)
        assert r["fake_width"] == 64 + h[0] % 192
        assert r["fake_height"] == 64 + h[1] % 192


def test_mm_frame_sample_reassembles_payload_prefix(spark):
    """Frame chunks are contiguous byte slices: per doc, frames must
    be index-ordered, non-overlapping, and concatenate to a prefix of
    the original payload; dims must match the stub's md5 derivation.
    This is the per-frame explode contract a real video decoder would
    inherit (one output row per sampled frame, bounded frame count).
    Exercises the BINARY explode (mm_sample_frames) underneath the
    oracle-checked scalar projection (mm_frame_sample)."""
    from kgx.harness import mm_sample_frames

    frames = mm_sample_frames(spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"].encode("utf-8")
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text").collect()
    }
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {d for d, raw in docs.items() if raw}
    for doc_id, rows in by_doc.items():
        raw = docs[doc_id]
        rows.sort(key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == list(range(len(rows)))
        assert 1 <= len(rows) <= 4
        joined = b"".join(bytes(r["frame_bytes"]) for r in rows)
        assert raw.startswith(joined) and joined
        text = raw.decode("utf-8")
        step = max(1, len(text) // 4)
        for r in rows:
            chunk = bytes(r["frame_bytes"])
            # chunk boundaries are CHARACTER positions (so every frame
            # is valid utf-8 and the DuckDB twin's substring matches)
            assert chunk == text[r["frame_idx"] * step:
                                 (r["frame_idx"] + 1) * step].encode(
                                     "utf-8")
            h = hashlib.md5(chunk).digest()
            assert r["width"] == 64 + h[0] % 192
            assert r["height"] == 64 + h[1] % 192


def test_frame_chunk_oracle_equivalence_unicode():
    """Property: the mm_frame_sample oracle's DuckDB character
    substring chunking is bit-identical to the stub's Python chunking
    (md5, byte length, dims) for ARBITRARY unicode text — the exact
    cross-engine contract the driver's value-hash check relies on.
    Runs engine-to-engine (DuckDB vs pure Python), no Spark session."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kgx.harness import OPS

    # the REGISTERED oracle SQL, not a copy — if the op's oracle ever
    # changes, this property test must re-prove the new contract
    oracle_sql = OPS["mm_frame_sample"][1]
    assert oracle_sql, "mm_frame_sample lost its oracle"
    sql = (f"SELECT * FROM ({oracle_sql}) "
           "ORDER BY doc_id, frame_idx")

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.text(max_size=24),  # full unicode incl. astral plane
            min_size=1,
            max_size=8,
        )
    )
    def check(texts):
        # DuckDB rejects unpaired surrogates; Python str allows them
        # but they can't be utf-8 encoded, so they can't occur in a
        # parquet/Arrow text column either — filter like Arrow would
        texts = [
            t for t in texts
            if not any("\ud800" <= ch <= "\udfff" for ch in t)
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        for i, t in enumerate(texts):
            con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
        duck = con.execute(sql).fetchall()
        py = []
        for doc_id, text in enumerate(texts):
            if not text:
                continue
            step = max(1, len(text) // 4)
            for i in range(4):
                piece = text[i * step : (i + 1) * step]
                if not piece:
                    break
                chunk = piece.encode("utf-8")
                h = hashlib.md5(chunk)
                d = h.digest()
                py.append((doc_id, i, h.hexdigest(), len(chunk),
                           64 + d[0] % 192, 64 + d[1] % 192))
        assert duck == py

    check()
