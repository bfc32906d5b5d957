"""File format readers/writers: CSV, JSON, Avro
(reference arrow/csv, arrow/array/json_reader.go, arrow/avro)."""
from . import avro, csv, json  # noqa: F401
from .avro import OCFReader, read_avro  # noqa: F401
from .csv import CSVReader, open_csv, read_csv, write_csv  # noqa: F401
from .json import read_json, write_json  # noqa: F401
