"""Functions package: T-SQL dialect shims over pyspark.sql.functions."""
