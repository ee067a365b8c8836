"""unify_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the capabilities of vendekagon-labs/unify
(reference snapshot at /root/reference, studied structurally in SURVEY.md):
schema inference/compilation, per-record and cross-record constraint
validation, reference/uniqueness resolution, checkpoint-resumable batch runs,
and violation reporting with per-row lineage — rebuilt over columnar Spark
DataFrames of audio clip + transcript pairs, designed for 10^12-row scale.

This is NOT a port: the reference is a row-at-a-time Clojure/Datomic
transducer pipeline (reference: src/com/vendekagonlabs/unify/import/engine.clj:128-188);
this engine expresses the same semantics as declarative DataFrame plans that
Catalyst/Tungsten optimize (predicate pushdown, whole-stage codegen, AQE).
"""

__version__ = "0.1.0"

from unify_spark.session import get_spark  # noqa: F401
