from simsearch_spark.functions import hashing, measures, text

__all__ = ["measures", "hashing", "text"]
