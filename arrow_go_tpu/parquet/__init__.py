"""Parquet format support (reference parquet/* 63k LoC stack, SURVEY.md §2d)."""
from . import format  # noqa: F401
from .encryption import (  # noqa: F401
    ColumnEncryptionProperties, FileDecryptionProperties,
    FileEncryptionProperties)
from .reader import ParquetFile, ReaderProperties, read_table  # noqa: F401
from .writer import (  # noqa: F401
    SortingColumn, WriterProperties, write_table)
