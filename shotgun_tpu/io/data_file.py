"""File-level I/O: extension gating, transparent gzip, parser dispatch.

Mirrors the reference's DataFile layer (reference: src/data_file.py:39-158):
``FASTAFile`` accepts ``.fa``/``.fa.gz``, ``FASTAQFile`` accepts
``.fq``/``.fq.gz``; the whole file is read (gzip-transparent) and handed to
the strict parser; ``NoRecordsInData`` is rewrapped into
``NoRecordsInDataFile`` with the file path in the message.

Parsing prefers the native C++ scanner (native/shotgun_io.cpp, ~50x the
regex engine) on ASCII input; any validation failure or non-ASCII content
falls back to the Python regex engine, which raises the reference's exact
exception types and messages -- so error behavior is identical by
construction.
"""

from __future__ import annotations

import gzip
from typing import FrozenSet, Optional

from shotgun_tpu.io import native
from shotgun_tpu.io.records import (
    FASTAParser,
    FASTQParser,
    NoRecordsInData,
    SchemaParser,
)


class InvalidExtensionError(Exception):
    def __init__(self, message: str = "") -> None:
        super().__init__(message)


class NoRecordsInDataFile(Exception):
    def __init__(self, message: str = "") -> None:
        super().__init__(message)


class DataFile:
    """Base class: validates the extension, loads, parses."""

    EXTENSIONS: FrozenSet[str] = frozenset()

    def __init__(self, file_path: str) -> None:
        if not self.EXTENSIONS:
            raise NotImplementedError("EXTENSIONS must be defined.")
        if not any(file_path.endswith(ext) for ext in self.EXTENSIONS):
            raise InvalidExtensionError(
                f"Invalid file extension. Expected one of {set(self.EXTENSIONS)}, got {file_path}"
            )
        raw = self._read_bytes(file_path)
        container = self._parse_native(raw)
        if container is None:
            container = self._make_parser()
            try:
                container.parse_records(raw.decode("utf-8"))
            except NoRecordsInData:
                raise NoRecordsInDataFile(
                    f"No valid records found in file: {file_path}"
                )
        self.container: SchemaParser = container

    def _make_parser(self) -> SchemaParser:
        raise NotImplementedError("This method must be implemented in subclasses.")

    def _parse_native(self, raw: bytes) -> Optional[SchemaParser]:
        """Native happy path; None -> use the regex engine (which also
        reproduces the exact error for invalid input)."""
        return None

    @staticmethod
    def _read_bytes(file_path: str) -> bytes:
        if file_path.endswith(".gz"):
            with gzip.open(file_path, "rb") as fh:
                return fh.read()
        with open(file_path, "rb") as fh:
            return fh.read()

    def dump(self, output_file: str) -> None:
        """Pickle the parsed container (reference data_file.py:92-98)."""
        import pickle

        with open(output_file, "wb") as fh:
            pickle.dump(self.container, fh)


class FASTAFile(DataFile):
    EXTENSIONS = frozenset({".fa", ".fa.gz"})

    def _make_parser(self) -> FASTAParser:
        return FASTAParser()

    def _parse_native(self, raw: bytes) -> Optional[FASTAParser]:
        try:
            res = native.fasta_parse(raw)
        except native.NativeParseError:
            return None
        if res is None:
            return None
        return FASTAParser.from_native(*res)


class FASTAQFile(DataFile):
    EXTENSIONS = frozenset({".fq", ".fq.gz"})

    def _make_parser(self) -> FASTQParser:
        return FASTQParser()

    def _parse_native(self, raw: bytes) -> Optional[FASTQParser]:
        try:
            res = native.fastq_parse(raw)
        except native.NativeParseError:
            return None
        if res is None:
            return None
        return FASTQParser.from_native(*res)


class FASTAQStream:
    """Streaming FASTQ source: validate once, fill record chunks on demand.

    The pipeline-parallel input path (SURVEY.md §2.2 PP row): the native
    scanner validates the whole file up front (same duplicate-id /
    unparsed-data / length-mismatch contracts as the full parse), then
    ``chunks`` fills packed [chunk, lmax] arrays one batch at a time so the
    caller can overlap host parse/pack with async device dispatch.  Record
    ids are never materialized as Python strings -- per-record ``.decode``
    calls are the dominant cost of the full parse at bench scale.

    Use ``open_fastq_stream``; anything the native fast path cannot serve
    (missing lib, non-ASCII input, any validation failure) returns None so
    the caller falls back to ``FASTAQFile``, whose regex engine reproduces
    the reference's exact error types and messages.
    """

    EXTENSIONS = FASTAQFile.EXTENSIONS

    def __init__(self, file_path: str) -> None:
        if not any(file_path.endswith(ext) for ext in self.EXTENSIONS):
            raise InvalidExtensionError(
                f"Invalid file extension. Expected one of {set(self.EXTENSIONS)}, got {file_path}"
            )
        raw = DataFile._read_bytes(file_path)  # gzip.BadGzipFile propagates
        info = native.fastq_scan(raw)  # NativeParseError propagates
        if info is None:
            raise native.NativeParseError(native.STATUS_NON_ASCII, 0, 0)
        self._raw = raw
        self.num_records: int = info.n_records
        self.max_len: int = info.max_len

    def chunks(self, chunk_records: int, lmax: int):
        """Yield (codes, qual, lengths, n_filled) with row stride ``lmax``
        (must be >= ``self.max_len``); fresh zeroed arrays per chunk."""
        return native.fastq_stream_chunks(self._raw, chunk_records, lmax)


def open_fastq_stream(file_path: str) -> Optional[FASTAQStream]:
    """FASTAQStream for the file, or None when the native fast path cannot
    serve it (the caller should construct FASTAQFile instead -- including
    for invalid inputs, where the regex engine raises the reference's exact
    errors).  InvalidExtensionError and gzip.BadGzipFile propagate."""
    try:
        return FASTAQStream(file_path)
    except native.NativeParseError:
        return None
