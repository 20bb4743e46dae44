"""Declared-query surface: the catalog consumed by __spark_entry__ and bench."""
