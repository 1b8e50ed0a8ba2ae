from simsearch_spark.sources.registry import Mount, load_table, mount_catalog

__all__ = ["Mount", "load_table", "mount_catalog"]
