from pond_spark.operators.accumulate import accumulate_more, accumulate_top, age_only
from pond_spark.operators.sessionize import track_visitors
from pond_spark.operators.stats import stats

__all__ = [
    "accumulate_top",
    "accumulate_more",
    "age_only",
    "track_visitors",
    "stats",
]
