from pond_spark.functions.anonymize import anonymize_ip
from pond_spark.functions.bm25 import bm25_search
from pond_spark.functions.nbayes import nb_classify
from pond_spark.functions.tfidf import tfidf_keywords
from pond_spark.functions.format import one_line, to_json_projection
from pond_spark.functions.geoip import geoip_country
from pond_spark.functions.hybrid import hybrid_search, rrf_fuse
from pond_spark.functions.lexindex import TextIndex, build_text_index
from pond_spark.functions.psl import load_psl_file, parse_psl, psl_domains
from pond_spark.functions.sanitize import sanitize_site

__all__ = [
    "anonymize_ip",
    "bm25_search",
    "nb_classify",
    "tfidf_keywords",
    "one_line",
    "to_json_projection",
    "geoip_country",
    "hybrid_search",
    "rrf_fuse",
    "TextIndex",
    "build_text_index",
    "load_psl_file",
    "parse_psl",
    "psl_domains",
    "sanitize_site",
]
