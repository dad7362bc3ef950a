"""tits_spark — a PySpark-native irregular time-series engine.

Rebuilds the capabilities of hroptatyr/tits (irregular-series kernels:
z-normalization, kernel-weighted ACF/XCF, Levinson-Durbin AR fitting,
polynomial roots, Lomb-Scargle periodogram, and the guess_lag streaming
pipeline) as an idiomatic Spark engine, extended with the scale-out
machinery the reference lacks: cascading rollup tiers (raw -> 1m -> 1h
-> 1d), LOCF/linear gap-fill, Gorilla compression, per-partition lineage
with checkpoint resume, skew-aware partitioning, plus large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Reference parity citations use `ref:<file>:<lines>` meaning a path under
/root/reference/src (e.g. ref:sacf.c:153-181).
"""

__version__ = "0.1.0"
