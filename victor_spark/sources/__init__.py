from victor_spark.sources.media import load_media_dir
from victor_spark.sources.sitemap import sitemap_entries
from victor_spark.sources.tables import TABLES, load_table, register_views
from victor_spark.sources.warc import (
    load_warc,
    warc_documents,
    wet_documents,
    write_warc,
)
from victor_spark.sources.webdataset import load_webdataset, write_webdataset

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "load_media_dir",
    "sitemap_entries",
    "load_warc",
    "warc_documents",
    "wet_documents",
    "write_warc",
    "load_webdataset",
    "write_webdataset",
]
