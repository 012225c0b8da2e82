"""Corpus sources: synthetic generator + parquet/Iceberg-style readers."""
