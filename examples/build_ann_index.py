"""Build and query a persisted IVFPQ vector index — the serving-style
similarity workflow (build once, search many).

    python examples/build_ann_index.py [sf_dir] [index_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pond_ivfpq_example"

    from pond_spark.session import get_spark
    from pond_spark.similarity.index import build_ivf_index

    spark = get_spark("build_ann_index")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = build_ivf_index(emb, path, n_centroids=16, pq_m=8, pq_ksub=16)

    query = [(i % 7) / 7.0 for i in range(64)]
    print("IVF-Flat search (stored vectors):")
    idx.search(query, k=5, nprobe=4).show()
    print("IVFPQ ADC search (code column only, exact re-rank):")
    idx.search_adc(query, k=5, nprobe=4).show()


if __name__ == "__main__":
    main()
