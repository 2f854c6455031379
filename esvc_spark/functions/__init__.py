"""Reusable column-expression function library (the engine's scalar/array
function surface beyond pyspark.sql.functions built-ins)."""
