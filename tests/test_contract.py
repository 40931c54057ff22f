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
