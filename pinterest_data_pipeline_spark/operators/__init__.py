"""Operator library: cleaning, dedup, similarity, text, multimodal.

Every operator is a pure function DataFrame -> DataFrame (or Column -> Column
for scalar expression helpers) built from ``pyspark.sql.functions`` built-ins
wherever semantics allow, so Catalyst sees through them (pushdown, pruning,
codegen). Pandas UDFs appear only where no built-in composition exists.
"""
