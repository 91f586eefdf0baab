"""bioner_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of the reference system (phil1995/BioNER, a
single-process Python NER pipeline) as an idiomatic Spark DataFrame engine:

    pages (url, warc_ts, html, text, lang)
      → extract_text          (Arrow-batched pandas UDF; byte-identical per
                               url to the single-node reference extractor)
      → tokenize              (native SQL: sentence split + token offsets)
      → NER tagging           (dictionary tagger in native SQL, or the
                               numpy BiLSTM kernel inside mapInPandas)
      → BIO span decode       (window functions; I-after-O opens a span,
                               per reference entity_level_precision_recall.py:134-164)
      → entity linking        (broadcast alias-dictionary join)
      → canonicalization      (connected components via iterative self-join)
      → triples (subj, pred, obj) partitioned Parquet + lineage manifest

Everything is DataFrame/SQL-first; the only Python kernels are Arrow-batched
pandas UDFs (extractor, neural forward). No per-row Python anywhere.
"""

__version__ = "0.1.0"
