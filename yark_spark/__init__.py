"""yark_spark — a PySpark-native analytics engine with the capabilities of
SupBlizard/yark (reference surveyed in SURVEY.md), extended with the
large-scale training-data-pipeline operators mandated by BASELINE.json.

Everything is expressed DataFrame-first so Catalyst/Tungsten pick the
physical plan; Python UDFs only where built-ins genuinely can't express
the semantics (network fetch, multimodal decode, custom stateful ops).
"""

__version__ = "0.1.0"
