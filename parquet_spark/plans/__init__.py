"""Encode-plan introspection — the codec analogue of `df.explain()`."""

from parquet_spark.plans.explain import explain_encode, explain_partitioning, plan_summary

__all__ = ["explain_encode", "explain_partitioning", "plan_summary"]
