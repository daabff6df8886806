from helix_spark.functions import status, text, urls, vectors  # noqa: F401
