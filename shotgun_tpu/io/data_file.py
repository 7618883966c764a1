"""File-level I/O: extension gating, transparent gzip, parser dispatch.

Mirrors the reference's DataFile layer (reference: src/data_file.py:39-158):
``FASTAFile`` accepts ``.fa``/``.fa.gz``, ``FASTAQFile`` accepts
``.fq``/``.fq.gz``; the whole file is read as text (gzip-transparent) and
handed to the strict parser; ``NoRecordsInData`` is rewrapped into
``NoRecordsInDataFile`` with the file path in the message.
"""

from __future__ import annotations

import gzip
import pickle
from typing import FrozenSet

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
        self.container: SchemaParser = self._make_parser()
        self._parse(file_path)

    def _make_parser(self) -> SchemaParser:
        raise NotImplementedError("This method must be implemented in subclasses.")

    def _parse(self, file_path: str) -> None:
        try:
            self.container.parse_records(self._read_text(file_path))
        except NoRecordsInData:
            raise NoRecordsInDataFile(f"No valid records found in file: {file_path}")

    @staticmethod
    def _read_text(file_path: str) -> str:
        if file_path.endswith(".gz"):
            with gzip.open(file_path, "rt", encoding="utf-8") as fh:
                return fh.read()
        with open(file_path, "r", encoding="utf-8") as fh:
            return fh.read()

    def dump(self, output_file: str) -> None:
        """Pickle the parsed container (reference data_file.py:92-98)."""
        with open(output_file, "wb") as fh:
            pickle.dump(self.container, fh)


class FASTAFile(DataFile):
    EXTENSIONS = frozenset({".fa", ".fa.gz"})

    def _make_parser(self) -> FASTAParser:
        return FASTAParser()


class FASTAQFile(DataFile):
    EXTENSIONS = frozenset({".fq", ".fq.gz"})

    def _make_parser(self) -> FASTQParser:
        return FASTQParser()
