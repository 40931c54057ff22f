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


def test_shingle_jaccard_separates_docs():
    from kgx.contract import shingle_jaccard, word_shingles

    base = ("the quick brown fox jumps over the lazy dog while the "
            "band plays a slow tune in the old town square tonight")
    near = base.replace("slow tune", "fast tune")
    other = ("completely different words about spark shuffles and "
             "partition pruning at terabyte scale with salted joins")
    assert shingle_jaccard(base, base) == 1.0
    assert shingle_jaccard(base, near) >= 0.7
    assert shingle_jaccard(base, other) < 0.05
    assert word_shingles("one two", k=3) == ["one two"]
    assert word_shingles("", k=3) == []


def test_shingle_minhash_estimates_and_bands():
    import numpy as np

    from kgx.contract import (
        band_keys,
        shingle_jaccard,
        shingle_minhash,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    near = base.replace("iota kappa", "iota kappa2")
    far = "uno dos tres cuatro cinco seis siete ocho nueve diez once"
    sa, sn, sf_ = (shingle_minhash(t) for t in (base, near, far))
    est = float((sa == sn).mean())
    assert abs(est - shingle_jaccard(base, near)) < 0.25
    # near-dup collides in >=1 band; unrelated docs collide in none
    assert set(band_keys(sa)) & set(band_keys(sn))
    assert not set(band_keys(sa)) & set(band_keys(sf_))
    assert sa.dtype == np.uint64 and len(sa) == 64
