from tailpipe_spark.sources.formats import read_with_format
from tailpipe_spark.sources.file_source import FileSource

__all__ = ["read_with_format", "FileSource"]
