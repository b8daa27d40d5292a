"""Sources and sinks (SURVEY.md §2.1).

The reference reads whole HDF5 arrays into RAM (``/root/reference/nlsh/data.py:23-49``)
and writes processed HDF5 + TorchScript checkpoints (``precompute.py:91-99``,
``nlsh/hashings.py:53-57``). Here: partitioned Parquet in and out, with
column pruning at the read and resumable directory layouts at the write
(checkpoints live in ``nlshray.pipelines.checkpoint``).
"""

from nlshray.sources.pages import read_docs, read_pages, write_partitioned
from nlshray.sources.warc import read_warc

__all__ = ["read_pages", "read_docs", "read_warc", "write_partitioned"]
