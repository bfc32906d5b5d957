from .arrays import *  # noqa: F401,F403
from .builders import make_builder, infer_type  # noqa: F401
from .concat import concat_arrays  # noqa: F401
from .record import ChunkedArray, Column, RecordBatch, Table, record_batch, table  # noqa: F401
