"""csv_cruncher_spark — a from-scratch PySpark-native CDC / incremental-ingest
and files-as-SQL-tables analytics engine.

Reimagines the capabilities of OndraZizka/csv-cruncher (reference surveyed in
/root/repo/SURVEY.md) as an idiomatic Spark engine:

- ``sources``   — CSV/JSON batch discovery, header parsing, schema-epoch
                  splitting, combine (multi-path UNION ALL scan), format
                  detection (reference: util/FilesUtils.kt, converters/).
- ``functions`` — scalar function surface (startsWith, jsonSubtree, jsonLeaf,
                  jsonLeaves; reference: util/SqlFunctions.kt) plus the
                  trial-cast type-inference ladder (util/SqlTypeReducer.kt).
- ``operators`` — dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
                  similarity search, text analysis, row-counter parity,
                  multimodal column plumbing; the training-corpus layer:
                  deterministic sampling + temperature mixing, test-set
                  decontamination, boilerplate removal, percentile quality
                  selection, per-domain caps, epoch shuffling, sequence
                  packing, one-call corpus builds.
- ``lake``      — LakeTable: Iceberg-style snapshot/manifest table on Parquet
                  with bucket layout, schema evolution (field ids), atomic
                  epoch-fenced commits; keyed LWW MERGE.
- ``cdc``       — change-batch replay pipeline: discovery → schema evolution →
                  LWW upsert → exactly-once commit → checkpoint/resume;
                  optional dead-letter quarantine for malformed events.
                  ``lake.ivm`` / ``lake.corpus_view`` keep downstream
                  aggregates and the selected training corpus incrementally
                  maintained off the change feed.
- ``crunch``    — csv-cruncher-equivalent "files in, SQL, file out" API
                  (Options/Cruncher; $table substitution, crunchCounter,
                  CSV/JSON exports, init SQL); ``cli`` wraps it with the
                  reference's option style and exit codes.

Everything is built on the public PySpark DataFrame/SQL API; no per-row
Python UDFs in any hot path (Arrow-batched pandas UDFs only).
"""

__version__ = "0.1.0"
