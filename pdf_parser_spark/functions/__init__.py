from .udfs import sha256_udf, weighted_quality_udaf  # noqa: F401
