"""ocel_ocpn_lakehouse_spark — a from-scratch PySpark-native lakehouse
table-maintenance engine with the capabilities of the reference
``pmsudhi/ocel-ocpn-lakehouse`` (Daft + PyIceberg), re-expressed Spark-first.

Layers (see SURVEY.md for the blueprint):

- :mod:`.core`        — Iceberg-style table format: catalog, snapshots,
                        manifests with per-file stats, atomic commits,
                        time travel, schema evolution.
- :mod:`.maintenance` — the executing maintenance engine: health analysis,
                        bin-packing compaction, Z-order/Hilbert clustering,
                        manifest rewrite, reference-counted snapshot expiry,
                        MERGE INTO (copy-on-write), checkpoint/lineage with
                        idempotent resume.
- :mod:`.images`      — deterministic image codec (pure numpy+zlib PNG and a
                        clearly-marked deterministic lossy codec), phash,
                        PSNR — all vectorized Arrow/pandas UDFs.
- :mod:`.functions`   — training-data pipeline ops: dedup (exact, MinHash
                        LSH, SimHash, n-gram Jaccard), similarity search,
                        text analysis (lang-id, quality, tokens,
                        fingerprints).
- :mod:`.queries`     — the reference's query surface (joins, aggregations,
                        windows, MV pipelines) over DataFrames.

Everything is pyspark.sql DataFrames + vectorized pandas/Arrow UDFs; no RDD
hot paths, no per-row Python UDFs.
"""

__version__ = "0.1.0"
