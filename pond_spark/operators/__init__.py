from pond_spark.operators.chunking import chunk_documents
from pond_spark.operators.funnel import event_transitions, funnel
from pond_spark.operators.profile import corpus_profile
from pond_spark.operators.rangejoin import range_join
from pond_spark.operators.sampling import mixture, stratified_sample, temperature_mixture
from pond_spark.operators.accumulate import accumulate_more, accumulate_top, age_only
from pond_spark.operators.asof import asof_join
from pond_spark.operators.rollup import rollup_by_time
from pond_spark.operators.sessionize import track_visitors
from pond_spark.operators.skew import salted_join
from pond_spark.operators.stats import stats

__all__ = [
    "accumulate_top",
    "accumulate_more",
    "age_only",
    "track_visitors",
    "stats",
    "asof_join",
    "rollup_by_time",
    "salted_join",
    "chunk_documents",
    "funnel",
    "event_transitions",
    "corpus_profile",
    "range_join",
    "mixture",
    "stratified_sample",
    "temperature_mixture",
]
