"""Contract primitives: MinHash estimate quality, id stability."""

import numpy as np

from kgx.contract import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_PERMS,
    band_keys,
    char_bigrams,
    entity_id,
    jaccard,
    minhash_signature,
    normalize,
    prov_id,
    sha16,
)


def test_normalize():
    assert normalize("  Ana Park ") == "ana park"  # NFKC nbsp -> space
    assert normalize("ＮＯＶＡ") == "nova"  # fullwidth folds


def test_ids_stable_and_disjoint():
    assert entity_id("PER", "ana park") == entity_id("PER", "ana park")
    assert entity_id("PER", "ana park") != entity_id("LOC", "ana park")
    assert prov_id("PER", "ana park") != entity_id("PER", "ana park")
    assert len(sha16("x")) == 16


def test_bigrams():
    assert char_bigrams("abc") == ["ab", "bc"]
    assert char_bigrams("a") == ["a"]
    assert char_bigrams("") == []


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(3)
    words = ["novagraph inc", "novagrap inc", "quantaflux labs",
             "ana park", "anna park", "lake virel"]
    for a in words:
        for b in words:
            sig_a, sig_b = minhash_signature(a), minhash_signature(b)
            est = float((sig_a == sig_b).mean())
            exact = jaccard(a, b)
            assert abs(est - exact) < 0.25, (a, b, est, exact)
    del rng


def test_misspell_pair_collides_in_some_band():
    # a dropped-char variant (J >= 0.7) must share >= 1 LSH band bucket
    a, b = "novagraph inc", "novagrap inc"
    assert jaccard(a, b) >= 0.7
    ka, kb = set(band_keys(minhash_signature(a))), set(
        band_keys(minhash_signature(b)))
    assert ka & kb, "expected at least one shared band"


def test_band_keys_shape():
    keys = band_keys(minhash_signature("ana park"))
    assert len(keys) == LSH_BANDS
    assert MINHASH_PERMS == LSH_BANDS * LSH_ROWS


# --- word-shingle minhash (document dedup granularity) -----------------------


def test_doc_jaccard_separates_docs():
    from kgx.contract import doc_jaccard, doc_shingles

    base = ("the quick brown fox jumps over the lazy dog while the "
            "band plays a slow tune in the old town square tonight")
    near = base.replace("slow tune", "fast tune")
    other = ("completely different words about spark shuffles and "
             "partition pruning at terabyte scale with salted joins")
    assert doc_jaccard(base, base) == 1.0
    assert doc_jaccard(base, near) >= 0.7
    assert doc_jaccard(base, other) < 0.05
    assert doc_shingles("one two") == ["one two"]
    assert doc_shingles("") == [""]  # single-space split keeps empties


def test_doc_minhash_estimates_and_bands():
    from kgx.contract import (
        DOC_PRIME,
        LSH_BANDS,
        LSH_ROWS,
        doc_jaccard,
        doc_minhash_sig,
    )

    def bkeys(sig):
        return {
            (g, tuple(sig[g * LSH_ROWS:(g + 1) * LSH_ROWS]))
            for g in range(LSH_BANDS)
        }

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    near = base.replace("iota kappa", "iota kappa2")
    far = "uno dos tres cuatro cinco seis siete ocho nueve diez once"
    sa, sn, sf_ = (doc_minhash_sig(t) for t in (base, near, far))
    est = sum(a == b for a, b in zip(sa, sn)) / 64
    assert abs(est - doc_jaccard(base, near)) < 0.25
    # near-dup collides in >=1 band; unrelated docs collide in none
    assert bkeys(sa) & bkeys(sn)
    assert not bkeys(sa) & bkeys(sf_)
    assert len(sa) == 64 and all(0 <= v < DOC_PRIME for v in sa)


def test_doc_simhash_hamming_tracks_similarity():
    from kgx.contract import doc_simhash

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    near = base.replace("phi chi", "phi psi")
    far = "uno dos tres cuatro cinco seis siete ocho nueve diez once"

    def ham(x, y):
        return bin(x[0] ^ y[0]).count("1") + bin(x[1] ^ y[1]).count("1")

    sb, sn, sf_ = (doc_simhash(t) for t in (base, near, far))
    assert all(0 <= h < (1 << 32) for h in (*sb, *sn, *sf_))
    assert ham(sb, sn) < ham(sb, sf_)
    assert ham(sb, sb) == 0
