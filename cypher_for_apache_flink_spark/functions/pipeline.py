"""End-to-end training-corpus curation: the LLM-pipeline operators composed
the way a 100 TB data pipeline chains them.

    raw docs ──quality filter──▶ exact dedup ──▶ near-dup removal ──▶ corpus

Every stage is one of this repo's deterministic operators, so the whole
pipeline is SQL-oracle-checkable end to end.  Removal rule for near-dups:
the HIGHER doc_id of any candidate pair above the Jaccard threshold is
dropped (deterministic, order-independent — no greedy chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_exact, minhash_lsh_pairs
from .text import quality_score


def curate_corpus(docs: DataFrame, quality_min: float = 0.4,
                  jaccard_threshold: float = 0.3,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Returns the surviving documents (all original columns).

    Stages: (1) drop docs under the quality threshold; (2) exact dedup
    keeping the lowest id per normalized-text fingerprint; (3) drop the
    higher id of every MinHash-LSH near-duplicate pair among survivors.
    """
    scored = docs.where(quality_score(F.col(text_col)) >= quality_min)
    deduped = dedup_exact(scored, text_col=text_col, id_col=id_col)
    pairs = minhash_lsh_pairs(deduped, threshold=jaccard_threshold,
                              text_col=text_col, id_col=id_col)
    losers = pairs.select(F.col("b").alias(id_col)).distinct()
    return deduped.join(losers, id_col, "left_anti")
