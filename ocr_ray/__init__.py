"""ocr_ray — a Ray-Data-native main-content extraction engine.

Replays the reference OCR text-spotter's extraction semantics
(detection -> NMS -> decode -> CTC collapse, SURVEY.md) as batch
operators over Parquet transcript turns, plus the training-data
operator families (dedup, similarity search, text analysis, sketches,
windows, joins). See README.md and COVERAGE.md.
"""

__version__ = "0.1.0"
