"""Shared persistence machinery for cross-run catalogs — the one
implementation of the read-bootstrap / parameter-sidecar /
crash-safe-compact discipline that DigestCatalog (dedup/exact.py),
MinHashCatalog (dedup/minhash.py) and EmbeddingCatalog
(similarity/catalog.py) all follow. The catalogs keep their
domain-specific key building and probe joins; everything about HOW a
catalog persists lives here exactly once, so a fix to the failure
discipline (e.g. a Spark release renaming the PATH_NOT_FOUND
condition) lands in one place.

The discipline, shared verbatim by all three:

- **read**: ONLY a missing path means "first run". Any other read
  failure (permissions, corrupt footer, storage blip) on an existing
  catalog must raise — failing open would silently disable cross-run
  dedup and re-admit everything previously shipped. Matched on the
  stable error CONDITION, not message text (varies by Spark
  version/locale). A ``._old`` sibling means a compact() died between
  its two renames — the catalog EXISTS and needs recovery, so read
  refuses to bootstrap empty and raises with the one-command fix.
- **params sidecar**: keyed catalogs pin their key-construction
  parameters in ``path + '.params.json'`` on first register; opening
  with different parameters raises (keys from different parameters
  are incomparable — probing would silently return garbage).
- **compact**: rewrite as one distinct row set via the crash-safe
  double rename — stage new, rename live ASIDE, rename staged in,
  delete old. POSIX gives no two-path atomic swap, so a crash exactly
  between the renames leaves ``path`` briefly absent with the data at
  ``path + '._old'`` — which read detects (above).

**Single-writer assumption** (all catalogs): filter/probe → register
is a read-then-append with no commit protocol; serialize writers
externally when pipelines share a catalog path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class CatalogStore:
    """Persistence backend for one catalog path. ``empty_schema`` is
    the DDL string an empty bootstrap returns; ``kind`` names the
    catalog in error messages; ``params``/``mismatch_hint`` enable the
    sidecar pinning (None disables it, e.g. the digest catalog whose
    key has no parameters)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        empty_schema: str,
        kind: str,
        params: dict | None = None,
        mismatch_hint: str = "keys from different parameters are incomparable",
    ):
        self.spark = spark
        self.path = path
        self.empty_schema = empty_schema
        self.kind = kind
        self.params = params
        self.mismatch_hint = mismatch_hint
        if params is not None:
            sidecar = self._sidecar()
            if os.path.exists(sidecar):
                with open(sidecar) as f:
                    stored = json.load(f)
                if stored != params:
                    raise ValueError(
                        f"{kind} at {path} was built with {stored}, "
                        f"opened with {params} — {mismatch_hint}"
                    )

    def _sidecar(self) -> str:
        return self.path + ".params.json"

    def read(self) -> DataFrame:
        from pyspark.errors import AnalysisException

        try:
            return self.spark.read.parquet(self.path)
        except AnalysisException as e:
            get_cond = getattr(e, "getCondition", None) or getattr(
                e, "getErrorClass", None
            )
            if get_cond and get_cond() == "PATH_NOT_FOUND":
                old = self.path + "._old"
                if os.path.exists(old):
                    raise RuntimeError(
                        f"{self.kind} missing at {self.path} but a "
                        f"compaction remnant exists at {old} — a "
                        "compact() crashed mid-swap. Recover with: "
                        f"mv {old} {self.path} (then re-run compact)"
                    ) from e
                return self.spark.createDataFrame([], self.empty_schema)
            raise

    def append(self, df: DataFrame) -> None:
        """Append a batch of key rows, pinning the parameter sidecar
        on first use."""
        if self.params is not None:
            sidecar = self._sidecar()
            if not os.path.exists(sidecar):
                with open(sidecar, "w") as f:
                    json.dump(self.params, f)
        df.write.mode("append").parquet(self.path)

    def compact(self) -> None:
        if not os.path.exists(self.path):
            return  # nothing registered yet — nothing to compact
        import shutil

        staged = self.path + "._compact"
        old = self.path + "._old"
        self.read().distinct().write.mode("overwrite").parquet(staged)
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(self.path, old)
        os.rename(staged, self.path)
        shutil.rmtree(old)
