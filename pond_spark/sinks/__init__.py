from pond_spark.sinks.writers import (
    write_jsonl,
    write_per_site,
    write_raw,
    write_text,
)

__all__ = ["write_text", "write_jsonl", "write_per_site", "write_raw"]
