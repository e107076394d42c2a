from pond_spark.functions.anonymize import anonymize_ip
from pond_spark.functions.format import one_line, to_json_projection
from pond_spark.functions.geoip import geoip_country
from pond_spark.functions.sanitize import sanitize_site

__all__ = [
    "anonymize_ip",
    "one_line",
    "to_json_projection",
    "geoip_country",
    "sanitize_site",
]
