from pond_spark.dedup.cluster import connected_components, dedup_near_keep_best
from pond_spark.dedup.decontaminate import contamination_report, decontaminate
from pond_spark.dedup.exact import DigestCatalog, dedup_exact, exact_duplicate_groups
from pond_spark.dedup.minhash import (
    MinHashCatalog,
    band_keys,
    minhash_lsh_pairs,
    minhash_signatures,
    minhash_signatures_from_grams,
)
from pond_spark.dedup.ngram import gram_hashes, ngram_jaccard_pairs
from pond_spark.dedup.simhash import (
    hamming_near_pairs,
    simhash64,
    simhash64_from_hashes,
    simhash_near_pairs,
)

__all__ = [
    "dedup_exact",
    "DigestCatalog",
    "exact_duplicate_groups",
    "minhash_signatures",
    "minhash_signatures_from_grams",
    "minhash_lsh_pairs",
    "MinHashCatalog",
    "band_keys",
    "gram_hashes",
    "ngram_jaccard_pairs",
    "simhash64",
    "simhash64_from_hashes",
    "simhash_near_pairs",
    "hamming_near_pairs",
    "connected_components",
    "dedup_near_keep_best",
    "contamination_report",
    "decontaminate",
]
