"""ocr_gang_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation (NOT a port) of the capabilities of the
reference OCR engine (theolebever/OCR-GANG, C99, studied at
/root/reference): fixed-threshold binarization, projection-profile
line/word/character segmentation, Conv3x3->MaxPool->MLP glyph
classification — re-expressed as vectorized NumPy kernels driven from
PySpark DataFrame operators over tables of interleaved text+media
documents, plus the relational / dedup / similarity / text-analysis
operator surface a web-scale training-data pipeline needs.

Layout:
  kernels/   pure-NumPy oracle kernels (bmp codec, image ops, nn, html strip)
  atlas.py   deterministic glyph atlas + text renderer
  synth.py   deterministic synthetic corpus generator (documents + media)
  pipeline.py  the Spark extraction pipeline (explode -> kernels -> reassemble)
  checkpoint.py  partition-level resumable runs with lineage metrics
  queries.py   driver-contract relational queries + DuckDB oracle SQL
  session.py   tuned SparkSession builder
"""

__version__ = "0.1.0"
