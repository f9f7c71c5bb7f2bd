from victor_spark.sources.media import load_media_dir
from victor_spark.sources.tables import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views", "load_media_dir"]
