from metis_ray.sources.parquet import read_corpus, read_table

__all__ = ["read_corpus", "read_table"]
