"""kgx — PySpark-native knowledge-graph construction engine.

A brand-new implementation of the behavioral contract in SURVEY.md
Appendix A (triple extraction, entity linking, canonicalization, graph
materialization over multi-turn transcript tables), built Spark-first:
DataFrame/SQL plans, Arrow-vectorized pandas UDFs for the tagger hot
path, iterative DataFrame joins for connected components.

Layout:
    kgx.contract  — frozen behavioral constants (tags, normalize, ids, minhash)
    kgx.tagcore   — lexicon matcher + CRF-Viterbi decode (shared frozen model)
    kgx.synth     — deterministic fixture generator (transcripts, alias_dict, ...)
    kgx.oracle    — sequential single-process reference pipeline (the "oracle")
    kgx.evalkit   — conlleval twin + triple-set P/R
    kgx.spark     — the distributed PySpark pipeline (stages, io, run)
    kgx.harness   — per-operator queries()/oracle_sql() over driver testdata
"""

__version__ = "0.1.0"
