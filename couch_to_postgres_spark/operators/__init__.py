from couch_to_postgres_spark.operators.mirror import docs_mirror, sanitize_table_name
from couch_to_postgres_spark.operators.cdc import apply_changes

__all__ = ["docs_mirror", "sanitize_table_name", "apply_changes"]
